"""Packfile: native (C++) mmap'd key/value dataset backend.

TPU-native replacement for the reference's LMDB pipeline
(`/root/reference/Deraining/basicsr/utils/file_client.py:76-146`,
`*/utils/create_lmdb.py`): lmdb is not in this image, so datasets are packed
into a single `.vmpack` file (sorted index + concatenated blobs) read by
`native/packfile.cc` through ctypes with zero-copy mmap access.

Writer (`write_packfile`) is pure Python; reader is native. The .so is
lazily built with g++ on first use and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
from typing import Dict, Iterable, List, Optional, Tuple

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native"
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libvmpack.so")
_MAGIC = b"VMPK0001"
_lock = threading.Lock()
_lib = None


def _load_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, "packfile.cc"))
        ):
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-std=c++17", "-shared",
                 "-o", _SO_PATH,
                 os.path.join(_NATIVE_DIR, "packfile.cc")],
                check=True,
            )
        lib = ctypes.CDLL(_SO_PATH)
        lib.vmpack_open.restype = ctypes.c_void_p
        lib.vmpack_open.argtypes = [ctypes.c_char_p]
        lib.vmpack_count.restype = ctypes.c_int64
        lib.vmpack_count.argtypes = [ctypes.c_void_p]
        lib.vmpack_get.restype = ctypes.c_int64
        lib.vmpack_get.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.vmpack_key.restype = ctypes.c_int64
        lib.vmpack_key.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_char_p),
        ]
        lib.vmpack_value_at.restype = ctypes.c_int64
        lib.vmpack_value_at.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.vmpack_prefetch.argtypes = [ctypes.c_void_p]
        lib.vmpack_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def write_packfile(path: str, items: Iterable[Tuple[str, bytes]]):
    """items: (key, value) pairs. Keys are sorted for binary search."""
    entries: List[Tuple[bytes, bytes]] = [
        (k.encode("utf-8"), v) for k, v in items
    ]
    entries.sort(key=lambda e: e[0])
    index = bytearray()
    offset = 0
    for k, v in entries:
        if len(k) > 0xFFFF:
            raise ValueError(f"key too long: {k[:64]!r}...")
        index += struct.pack("<H", len(k)) + k
        index += struct.pack("<QQ", offset, len(v))
        offset += len(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<QQ", len(entries), len(index)))
        f.write(bytes(index))
        for _, v in entries:
            f.write(v)
    os.replace(tmp, path)


class PackReader:
    def __init__(self, path: str, prefetch: bool = False):
        self._lib = _load_lib()
        self._h = self._lib.vmpack_open(str(path).encode())
        if not self._h:
            raise IOError(f"cannot open packfile {path}")
        if prefetch:
            self._lib.vmpack_prefetch(self._h)

    def __len__(self):
        return int(self._lib.vmpack_count(self._h))

    def keys(self) -> List[str]:
        out = []
        p = ctypes.c_char_p()
        for i in range(len(self)):
            n = self._lib.vmpack_key(self._h, i, ctypes.byref(p))
            if n >= 0:
                out.append(p.value.decode("utf-8"))
        return out

    def get(self, key: str) -> bytes:
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        n = self._lib.vmpack_get(self._h, key.encode(), ctypes.byref(ptr))
        if n < 0:
            raise KeyError(key)
        return ctypes.string_at(ptr, n)

    def close(self):
        if self._h:
            self._lib.vmpack_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class PackBackend:
    """FileClient backend: db_paths/client_keys like the lmdb backend."""

    def __init__(self, db_paths, client_keys="default", **kwargs):
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths)
        self._client: Dict[str, PackReader] = {
            key: PackReader(path)
            for key, path in zip(client_keys, db_paths)
        }

    def get(self, filepath: str, client_key: str = "default") -> bytes:
        return self._client[client_key].get(str(filepath))
