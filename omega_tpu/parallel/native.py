"""ctypes binding for the native partition/halo library.

Loads native/libomega_native.so (built by `make -C native`; built on
demand here if the toolchain is available) and exposes:

  hilbert_keys(x, y)          — SFC keys (better locality than the Morton
                                fallback in decomp.py)
  partition_geom(x, y, n)     — owner per cell by Hilbert chunking
  halo_layers(...)            — BFS halo rings per shard, CSR

Every entry point has a pure-numpy fallback so the package works without
a compiler; `available()` reports which path is active. The native path
matters at init time on 10^6+-cell meshes (the role ParMETIS plays in
base/Decomp.cpp:1213).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libomega_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "Makefile")):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")

    lib.omega_hilbert_keys.argtypes = [f64p, f64p, ctypes.c_int64,
                                       ctypes.c_int, u64p]
    lib.omega_hilbert_keys.restype = None
    lib.omega_partition_geom.argtypes = [f64p, f64p, ctypes.c_int64,
                                         ctypes.c_int, ctypes.c_int, i64p]
    lib.omega_partition_geom.restype = None
    lib.omega_halo_layers.argtypes = [i64p, i32p, ctypes.c_int64,
                                      ctypes.c_int, i64p, ctypes.c_int,
                                      ctypes.c_int, i64p, ctypes.c_int64,
                                      i64p]
    lib.omega_halo_layers.restype = ctypes.c_int64
    lib.omega_refine_partition.argtypes = [i64p, i32p, ctypes.c_int64,
                                           ctypes.c_int, ctypes.c_int,
                                           ctypes.c_int, ctypes.c_double,
                                           i64p]
    lib.omega_refine_partition.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def hilbert_keys(x: np.ndarray, y: np.ndarray, bits: int = 16) -> np.ndarray:
    """Hilbert SFC keys for points normalized to [0, 1)."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    n = len(x)
    if lib is not None:
        keys = np.empty(n, np.uint64)
        lib.omega_hilbert_keys(x, y, n, bits, keys)
        return keys
    return _hilbert_py(x, y, bits)


def partition_geom(x: np.ndarray, y: np.ndarray, nparts: int,
                   bits: int = 16) -> np.ndarray:
    """Owner shard per point: Hilbert sort + equal chunks."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float64)
    y = np.ascontiguousarray(y, np.float64)
    n = len(x)
    if lib is not None:
        owner = np.empty(n, np.int64)
        lib.omega_partition_geom(x, y, n, nparts, bits, owner)
        return owner
    keys = _hilbert_py(x, y, bits)
    order = np.argsort(keys, kind="stable")
    owner = np.empty(n, np.int64)
    owner[order] = (np.arange(n, dtype=np.int64) * nparts) // n
    return owner


def halo_layers(cells_on_cell: np.ndarray, n_eoc: np.ndarray,
                owner: np.ndarray, nparts: int,
                width: int) -> List[Tuple[np.ndarray, List[np.ndarray]]]:
    """Per shard: (owned cell ids, [ring1 ids, ..., ringW ids])."""
    lib = _load()
    C, M = cells_on_cell.shape
    if lib is not None:
        coc = np.ascontiguousarray(cells_on_cell, np.int64)
        ne = np.ascontiguousarray(n_eoc, np.int32)
        own = np.ascontiguousarray(owner, np.int64)
        cap = np.int64(C * min(nparts, 4) + 16)   # generous first guess
        offsets = np.empty(nparts * (width + 1) + 1, np.int64)
        cells = np.empty(cap, np.int64)
        got = lib.omega_halo_layers(coc, ne, C, M, own, nparts, width,
                                    cells, cap, offsets)
        if got < 0:
            cap = -got
            cells = np.empty(cap, np.int64)
            got = lib.omega_halo_layers(coc, ne, C, M, own, nparts, width,
                                        cells, cap, offsets)
        out = []
        idx = 0
        for s in range(nparts):
            base = s * (width + 1)
            ownc = cells[offsets[base]:offsets[base + 1]].copy()
            rings = [cells[offsets[base + w]:offsets[base + w + 1]].copy()
                     for w in range(1, width + 1)]
            out.append((ownc, rings))
        return out
    return _halo_py(cells_on_cell, n_eoc, owner, nparts, width)


# ---------------- numpy fallbacks ----------------

def _hilbert_py(x, y, bits):
    n = len(x)
    scale = float(1 << bits)
    xq = np.minimum((np.mod(x, 1.0) * scale), scale - 1).astype(np.uint64)
    yq = np.minimum((np.mod(y, 1.0) * scale), scale - 1).astype(np.uint64)
    rx = np.zeros(n, np.uint64)
    ry = np.zeros(n, np.uint64)
    d = np.zeros(n, np.uint64)
    x_, y_ = xq.copy(), yq.copy()
    s = np.uint64(1 << (bits - 1))
    while s > 0:
        rx = ((x_ & s) > 0).astype(np.uint64)
        ry = ((y_ & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - np.uint64(1) - x_, x_)
        y_f = np.where(flip, s - np.uint64(1) - y_, y_)
        x_new = np.where(swap, y_f, x_f)
        y_new = np.where(swap, x_f, y_f)
        x_, y_ = x_new, y_new
        s >>= np.uint64(1)
    return d


def _halo_py(cells_on_cell, n_eoc, owner, nparts, width):
    C, M = cells_on_cell.shape
    valid = np.arange(M)[None, :] < np.asarray(n_eoc)[:, None]
    out = []
    for s in range(nparts):
        ownc = np.where(owner == s)[0]
        seen = np.zeros(C, bool)
        seen[ownc] = True
        rings = []
        frontier = ownc
        for _ in range(width):
            nbrs = cells_on_cell[frontier]
            ok = valid[frontier] & (nbrs >= 0)
            cand = np.unique(nbrs[ok])
            new = cand[~seen[cand]]
            seen[new] = True
            rings.append(new)
            frontier = new
        out.append((ownc, rings))
    return out


def refine_partition(cells_on_cell: np.ndarray, n_eoc: np.ndarray,
                     owner: np.ndarray, nparts: int, passes: int = 8,
                     imbalance: float = 0.02):
    """Greedy KL boundary refinement (C++). Mutates a copy of `owner`;
    returns (refined owner, edge cut) or (owner, None) without the lib."""
    lib = _load()
    out = np.ascontiguousarray(owner, np.int64).copy()
    if lib is None:
        return out, None
    coc = np.ascontiguousarray(cells_on_cell, np.int64)
    ne = np.ascontiguousarray(n_eoc, np.int32)
    cut = lib.omega_refine_partition(coc, ne, coc.shape[0], coc.shape[1],
                                     nparts, passes, imbalance, out)
    return out, int(cut)
