"""File IO backends: disk / lmdb / memcached.

Counterpart of `/root/reference/Deraining/basicsr/utils/file_client.py:5-186`.
The lmdb and memcached backends are gated on their optional dependencies
(neither ships in this image); the disk backend is the default.
"""

from __future__ import annotations

from typing import Dict, Optional


class DiskBackend:
    def get(self, filepath: str, client_key: str | None = None) -> bytes:
        with open(str(filepath), "rb") as f:
            return f.read()

    def get_text(self, filepath: str) -> str:
        with open(str(filepath), "r") as f:
            return f.read()


class LmdbBackend:
    """Multi-database lmdb reader: db_paths/client_keys lists, keys resolve
    per-client like the reference (`file_client.py:76-146`)."""

    def __init__(self, db_paths, client_keys="default", readonly=True,
                 lock=False, readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError as e:  # pragma: no cover
            raise ImportError(
                "lmdb is not installed in this environment; use the 'disk' "
                "backend or install lmdb"
            ) from e
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, (str,)):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths)
        self._client = {}
        for key, path in zip(client_keys, db_paths):
            self._client[key] = lmdb.open(
                str(path), readonly=readonly, lock=lock,
                readahead=readahead, **kwargs,
            )

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            return txn.get(str(filepath).encode("ascii"))


class MemcachedBackend:  # pragma: no cover - optional
    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        raise NotImplementedError(
            "memcached backend is not supported in this environment"
        )


def _pack_backend(**kwargs):
    from .packfile import PackBackend

    return PackBackend(**kwargs)


class FileClient:
    """Unified IO client dispatching to a backend by name.

    Backends: disk (default), lmdb (optional dep), pack (native mmap
    packfile, `native/packfile.cc` — the TPU-rebuild's lmdb replacement),
    memcached (unsupported here)."""

    _backends = {
        "disk": DiskBackend,
        "lmdb": LmdbBackend,
        "pack": _pack_backend,
        "memcached": MemcachedBackend,
    }

    def __init__(self, backend: str = "disk", **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f"backend {backend} not supported; choose from "
                f"{list(self._backends)}"
            )
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key: str = "default"):
        if self.backend in ("lmdb", "pack"):
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)

    def get_text(self, filepath):
        return self.client.get_text(filepath)
