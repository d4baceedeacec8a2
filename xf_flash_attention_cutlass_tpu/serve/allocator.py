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
        lib.xfa_request_admit_prefixed.restype = ctypes.c_int32
        lib.xfa_request_admit_prefixed.argtypes = (
            [ctypes.c_void_p] + [ctypes.c_int32] * 4
        )
        lib.xfa_prefix_alloc.restype = ctypes.c_int32
        lib.xfa_prefix_alloc.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.xfa_prefix_free.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.xfa_request_shared_pages.restype = ctypes.c_int32
        lib.xfa_request_shared_pages.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.xfa_request_truncate.restype = ctypes.c_int32
        lib.xfa_request_truncate.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
        ]
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
        self.slots = [None] * max_requests  # [id, seq_len, pages, shared]

    def admit(self, rid, prompt_len, target_len, shared_pages=0):
        if prompt_len < shared_pages * self.page_size:
            return -1
        try:
            slot = self.slots.index(None)
        except ValueError:
            return -1
        need = max(-(-prompt_len // self.page_size) - shared_pages, 0)
        if len(self.free_list) < need:
            return -1
        pages = [self.free_list.pop() for _ in range(need)]
        self.slots[slot] = [rid, prompt_len, pages, shared_pages]
        return slot

    def prefix_alloc(self, n_pages):
        if len(self.free_list) < n_pages:
            return None
        return [self.free_list.pop() for _ in range(n_pages)]

    def prefix_free(self, pages):
        self.free_list.extend(pages)

    def extend(self, slot, n_tokens):
        ent = self.slots[slot]
        if ent is None:
            return -1
        need = (-(-(ent[1] + n_tokens) // self.page_size) - ent[3]
                - len(ent[2]))
        if need > len(self.free_list):
            return -1
        for _ in range(need):
            ent[2].append(self.free_list.pop())
        ent[1] += n_tokens
        return ent[1]

    def truncate(self, slot, new_len):
        ent = self.slots[slot]
        if ent is None or new_len < ent[3] * self.page_size:
            return -1
        if new_len >= ent[1]:
            return ent[1]
        keep = max(-(-new_len // self.page_size) - ent[3], 0)
        while len(ent[2]) > keep:
            self.free_list.append(ent[2].pop())
        ent[1] = new_len
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
                words += [0, -1, 0, 0, 0, 0]
            else:
                words += [1, ent[0], ent[1], 0, ent[3], len(ent[2])] + list(ent[2])
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
            active, rid, seq_len, _target, shared, n_pg = w[r : r + 6]
            r += 6
            pages = w[r : r + n_pg]
            r += n_pg
            self.slots[s] = [rid, seq_len, pages, shared] if active else None


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

    def admit_prefixed(self, request_id: int, shared_pages: int,
                       prompt_len: int, target_len: int) -> int:
        """Admit with the first `shared_pages` logical pages provided by a
        shared prefix (see prefix_alloc); only the tail pages are owned."""
        if self._lib:
            return self._lib.xfa_request_admit_prefixed(
                self._h, request_id, shared_pages, prompt_len, target_len
            )
        return self._py.admit(request_id, prompt_len, target_len,
                              shared_pages=shared_pages)

    def prefix_alloc(self, n_pages: int):
        """Reserve pages for a shared prefix; returns list of page ids or
        None on OOM. Freed only by prefix_free."""
        if self._lib:
            buf = np.zeros((max(n_pages, 1),), np.int32)
            rc = self._lib.xfa_prefix_alloc(
                self._h, n_pages,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            return buf[:n_pages].tolist() if rc == 0 else None
        return self._py.prefix_alloc(n_pages)

    def prefix_free(self, pages) -> None:
        if self._lib:
            buf = np.asarray(pages, np.int32)
            self._lib.xfa_prefix_free(
                self._h,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(buf),
            )
        else:
            self._py.prefix_free(list(pages))

    def shared_pages(self, slot: int) -> int:
        if self._lib:
            return self._lib.xfa_request_shared_pages(self._h, slot)
        ent = self._py.slots[slot]
        return ent[3] if ent else -1

    def truncate(self, slot: int, new_len: int) -> int:
        """Shrink a sequence (speculative-decode rollback); frees pages that
        held only rejected-draft KV. Returns the new seq_len."""
        if self._lib:
            return self._lib.xfa_request_truncate(self._h, slot, new_len)
        return self._py.truncate(slot, new_len)

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
            off = min(ent[3], max_pages)
            pages = ent[2][: max(max_pages - off, 0)]
            bt[s, off : off + len(pages)] = pages
            sl[s] = ent[1]
            n += 1
        return bt, sl, n


class DpPagePools:
    """dp independent PagePools presenting one global-slot interface.

    The dp x tp serving layout (parallel/tp_serve.tp_dp_decode_step) gives
    each data-parallel replica its own disjoint slice of the page pool and
    of the batch: global slot r*mb_local + s maps to local slot s of
    replica r, and every page id handed out is LOCAL to its replica's pool
    shard (the device pool arrays are sharded over "dp" on the page axis,
    so local ids index the shard directly — zero cross-replica traffic).
    """

    def __init__(self, dp: int, num_pages_local: int, page_size: int,
                 max_requests_local: int):
        self.dp = dp
        self.mb_local = max_requests_local
        self.pools = [
            PagePool(num_pages_local, page_size, max_requests_local)
            for _ in range(dp)
        ]

    @property
    def native(self) -> bool:
        return all(p.native for p in self.pools)

    def _split(self, slot: int):
        return self.pools[slot // self.mb_local], slot % self.mb_local

    def free_pages(self) -> int:
        return sum(p.free_pages() for p in self.pools)

    def admit_replica(self, replica: int, request_id: int, prompt_len: int,
                      target_len: int) -> int:
        s = self.pools[replica].admit(request_id, prompt_len, target_len)
        return -1 if s < 0 else replica * self.mb_local + s

    def admit(self, request_id: int, prompt_len: int, target_len: int) -> int:
        # least-loaded replica first (balances batch rows across replicas)
        order = sorted(range(self.dp),
                       key=lambda r: -self.pools[r].free_pages())
        for r in order:
            s = self.admit_replica(r, request_id, prompt_len, target_len)
            if s >= 0:
                return s
        return -1

    def admit_prefixed_replica(self, replica: int, request_id: int,
                               shared_pages: int, prompt_len: int,
                               target_len: int) -> int:
        s = self.pools[replica].admit_prefixed(
            request_id, shared_pages, prompt_len, target_len
        )
        return -1 if s < 0 else replica * self.mb_local + s

    def prefix_alloc_all(self, n_pages: int):
        """Reserve `n_pages` prefix pages in EVERY replica's pool (the
        prefix KV is replicated into each dp shard so any replica's
        requests can attend to it with LOCAL page ids). Returns a list of
        dp page-id lists, or None if any replica lacks room (all-or-
        nothing: partial reservations are rolled back)."""
        out = []
        for p in self.pools:
            pages = p.prefix_alloc(n_pages)
            if pages is None:
                for q, done in zip(self.pools, out):
                    q.prefix_free(done)
                return None
            out.append(pages)
        return out

    def prefix_free_all(self, pages_by_replica) -> None:
        for p, pages in zip(self.pools, pages_by_replica):
            if pages:
                p.prefix_free(pages)

    def extend(self, slot: int, n_tokens: int = 1) -> int:
        p, s = self._split(slot)
        return p.extend(s, n_tokens)

    def truncate(self, slot: int, new_len: int) -> int:
        p, s = self._split(slot)
        return p.truncate(s, new_len)

    def retire(self, slot: int) -> None:
        p, s = self._split(slot)
        p.retire(s)

    def seq_len(self, slot: int) -> int:
        p, s = self._split(slot)
        return p.seq_len(s)

    def build_block_tables(self, max_pages: int):
        """Global (dp*mb_local, max_pages) tables of LOCAL page ids."""
        bts, lens, n_active = [], [], 0
        for p in self.pools:
            bt, kv, n = p.build_block_tables(max_pages)
            bts.append(bt)
            lens.append(kv)
            n_active += int(n)
        return np.concatenate(bts), np.concatenate(lens), n_active

    def snapshot(self) -> np.ndarray:
        parts = [p.snapshot() for p in self.pools]
        n = max(len(x) for x in parts)
        out = np.zeros((self.dp, n + 1), np.int64)
        for r, x in enumerate(parts):
            out[r, 0] = len(x)
            out[r, 1 : 1 + len(x)] = x
        return out.reshape(-1)

    def restore(self, words: np.ndarray) -> None:
        words = np.asarray(words, np.int64).reshape(self.dp, -1)
        for r, row in enumerate(words):
            self.pools[r].restore(row[1 : 1 + int(row[0])])
