"""ctypes binding for the native C++ page allocator (csrc/page_allocator.cpp).

Compiled on first use with g++ (no pybind11 in this environment); the .so is
cached next to the source. A pure-Python fallback keeps the package usable
where no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
    "page_allocator.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "libxfa_page_allocator.so")
_lock = threading.Lock()
_lib = None


def _build() -> Optional[ctypes.CDLL]:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
        except (OSError, subprocess.CalledProcessError):
            return None
        lib.xfa_pool_create.restype = ctypes.c_void_p
        lib.xfa_pool_create.argtypes = [ctypes.c_int32] * 3
        lib.xfa_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.xfa_pool_free_pages.restype = ctypes.c_int32
        lib.xfa_pool_free_pages.argtypes = [ctypes.c_void_p]
        lib.xfa_request_admit.restype = ctypes.c_int32
        lib.xfa_request_admit.argtypes = [ctypes.c_void_p] + [ctypes.c_int32] * 3
        lib.xfa_request_extend.restype = ctypes.c_int32
        lib.xfa_request_extend.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
        lib.xfa_request_retire.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.xfa_request_seq_len.restype = ctypes.c_int32
        lib.xfa_request_seq_len.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.xfa_request_id.restype = ctypes.c_int32
        lib.xfa_request_id.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.xfa_build_block_tables.restype = ctypes.c_int32
        lib.xfa_build_block_tables.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.xfa_pool_alloc_count.restype = ctypes.c_int64
        lib.xfa_pool_alloc_count.argtypes = [ctypes.c_void_p]
        lib.xfa_pool_snapshot_size.restype = ctypes.c_int32
        lib.xfa_pool_snapshot_size.argtypes = [ctypes.c_void_p]
        lib.xfa_pool_snapshot.restype = ctypes.c_int32
        lib.xfa_pool_snapshot.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.xfa_pool_restore.restype = ctypes.c_int32
        lib.xfa_pool_restore.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        _lib = lib
        return _lib


class _PyPool:
    """Pure-Python fallback with identical semantics."""

    def __init__(self, num_pages: int, page_size: int, max_requests: int):
        self.num_pages = num_pages
        self.page_size = page_size
        self.free_list = list(range(num_pages - 1, -1, -1))
        self.slots = [None] * max_requests  # (id, seq_len, pages)

    def admit(self, rid, prompt_len, target_len):
        try:
            slot = self.slots.index(None)
        except ValueError:
            return -1
        need = -(-prompt_len // self.page_size)
        if len(self.free_list) < need:
            return -1
        pages = [self.free_list.pop() for _ in range(need)]
        self.slots[slot] = [rid, prompt_len, pages]
        return slot

    def extend(self, slot, n_tokens):
        ent = self.slots[slot]
        if ent is None:
            return -1
        need = -(-(ent[1] + n_tokens) // self.page_size) - len(ent[2])
        if need > len(self.free_list):
            return -1
        for _ in range(need):
            ent[2].append(self.free_list.pop())
        ent[1] += n_tokens
        return ent[1]

    def retire(self, slot):
        ent = self.slots[slot]
        if ent is not None:
            self.free_list.extend(ent[2])
            self.slots[slot] = None

    def snapshot(self):
        words = [self.num_pages, self.page_size, len(self.slots),
                 len(self.free_list)] + list(self.free_list)
        for ent in self.slots:
            if ent is None:
                words += [0, -1, 0, 0, 0]
            else:
                words += [1, ent[0], ent[1], 0, len(ent[2])] + list(ent[2])
        return np.asarray(words, np.int32)

    def restore(self, words):
        w = np.asarray(words, np.int32).tolist()
        if w[:3] != [self.num_pages, self.page_size, len(self.slots)]:
            raise ValueError("allocator snapshot geometry mismatch")
        n_free = w[3]
        r = 4
        self.free_list = w[r : r + n_free]
        r += n_free
        for s in range(len(self.slots)):
            active, rid, seq_len, _target, n_pg = w[r : r + 5]
            r += 5
            pages = w[r : r + n_pg]
            r += n_pg
            self.slots[s] = [rid, seq_len, pages] if active else None


class PagePool:
    """KV page pool + request table. Uses the C++ allocator when available."""

    def __init__(self, num_pages: int, page_size: int, max_requests: int):
        self.num_pages = num_pages
        self.page_size = page_size
        self.max_requests = max_requests
        self._lib = _build()
        if self._lib is not None:
            self._h = self._lib.xfa_pool_create(num_pages, page_size, max_requests)
            self._py = None
        else:  # pragma: no cover - toolchain-less fallback
            self._h = None
            self._py = _PyPool(num_pages, page_size, max_requests)

    @property
    def native(self) -> bool:
        return self._lib is not None

    def __del__(self):
        if getattr(self, "_lib", None) is not None and self._h:
            self._lib.xfa_pool_destroy(self._h)
            self._h = None

    def free_pages(self) -> int:
        if self._lib:
            return self._lib.xfa_pool_free_pages(self._h)
        return len(self._py.free_list)

    def admit(self, request_id: int, prompt_len: int, target_len: int) -> int:
        if self._lib:
            return self._lib.xfa_request_admit(
                self._h, request_id, prompt_len, target_len
            )
        return self._py.admit(request_id, prompt_len, target_len)

    def extend(self, slot: int, n_tokens: int = 1) -> int:
        if self._lib:
            return self._lib.xfa_request_extend(self._h, slot, n_tokens)
        return self._py.extend(slot, n_tokens)

    def retire(self, slot: int) -> None:
        if self._lib:
            self._lib.xfa_request_retire(self._h, slot)
        else:
            self._py.retire(slot)

    def seq_len(self, slot: int) -> int:
        if self._lib:
            return self._lib.xfa_request_seq_len(self._h, slot)
        ent = self._py.slots[slot]
        return ent[1] if ent else -1

    def snapshot(self) -> np.ndarray:
        """Serialize allocator state (free list + per-slot page maps) to an
        int32 vector — the checkpointable control-plane state."""
        if self._lib:
            n = self._lib.xfa_pool_snapshot_size(self._h)
            buf = np.zeros((n,), np.int32)
            wrote = self._lib.xfa_pool_snapshot(
                self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n
            )
            if wrote < 0:
                raise RuntimeError("allocator snapshot failed")
            return buf[:wrote]
        return self._py.snapshot()

    def restore(self, words: np.ndarray) -> None:
        """Restore state captured by snapshot() into a same-geometry pool."""
        buf = np.ascontiguousarray(np.asarray(words, np.int32))
        if self._lib:
            rc = self._lib.xfa_pool_restore(
                self._h,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(buf),
            )
            if rc != 0:
                raise ValueError("allocator snapshot geometry mismatch")
        else:
            self._py.restore(buf)

    def build_block_tables(self, max_pages: int):
        """Returns (block_tables (max_requests, max_pages) int32,
        seq_lens (max_requests,) int32, n_active)."""
        bt = np.zeros((self.max_requests, max_pages), np.int32)
        sl = np.zeros((self.max_requests,), np.int32)
        if self._lib:
            n = self._lib.xfa_build_block_tables(
                self._h,
                bt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                max_pages,
                sl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return bt, sl, n
        n = 0
        for s, ent in enumerate(self._py.slots):
            if ent is None:
                continue
            pages = ent[2][:max_pages]
            bt[s, : len(pages)] = pages
            sl[s] = ent[1]
            n += 1
        return bt, sl, n
