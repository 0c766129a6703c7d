#!/usr/bin/env python
"""Single-image / folder inference CLI (thin shim; the implementation lives
in `vmambair_tpu.inference` so the pip-installed package exposes the same
entry point from any cwd)."""

from vmambair_tpu.inference import main

if __name__ == "__main__":
    main()
