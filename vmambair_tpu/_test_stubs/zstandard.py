"""Import stub that hides the real `zstandard` package from test sessions.

JAX's persistent compilation cache prefers zstandard when importable and
falls back to zlib otherwise (`jax/_src/compilation_cache.py:190-206`).
Under the single-core test environment the zstandard C extension
reproducibly SIGABRTs inside `put_executable_and_time` late in a full
`pytest tests/` run (observed twice at ~620/686 tests), killing the
session before the summary line. The test bootstrap
(`vmambair_tpu/_pytest_boot.py` / `tests/conftest.py`) prepends this
package's directory to PYTHONPATH so the import fails and JAX uses zlib
for both reads and writes. Existing cache entries are zlib-converted
on disk (round-5 migration), so warm-cache behavior is unchanged.
"""

raise ImportError(
    "zstandard is disabled under the vmambair test session; JAX's "
    "compile cache falls back to zlib (see vmambair_tpu/_test_stubs/)."
)
