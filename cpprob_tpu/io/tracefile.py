"""Offline trace shards for inference-compilation training.

Counterpart of the reference's offline-training pipeline: the C++ engine dumps
UUID-named trace batches (``socket.cpp:79-98``), the Python trainer samples
random files (``RequesterFile``, ``client.py:60-91``).  Here:

- :func:`write_trace_shard` serializes a generated trace batch to the binary
  shard format read by the native loader (``native/src/tracefile.cpp``);
- :class:`TraceLoader` assembles random minibatches, using the C++
  mmap+prefetch-thread loader when the shared library is available (built
  lazily with ``make``) and a NumPy fallback otherwise.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import uuid
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["write_trace_shard", "TraceLoader", "native_available", "dump_traces"]

_MAGIC = 0x43505454
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcpprob_native.so")

_lib = None
_lib_tried = False


def _load_native():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.cpprob_loader_open.restype = ctypes.c_void_p
        lib.cpprob_loader_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_uint32,
            ctypes.c_int, ctypes.c_uint64,
        ]
        lib.cpprob_loader_row_len.restype = ctypes.c_uint64
        lib.cpprob_loader_row_len.argtypes = [ctypes.c_void_p]
        lib.cpprob_loader_obs_dim.restype = ctypes.c_uint32
        lib.cpprob_loader_obs_dim.argtypes = [ctypes.c_void_p]
        lib.cpprob_loader_total_traces.restype = ctypes.c_uint64
        lib.cpprob_loader_total_traces.argtypes = [ctypes.c_void_p]
        lib.cpprob_loader_n_sites.restype = ctypes.c_int
        lib.cpprob_loader_n_sites.argtypes = [ctypes.c_void_p]
        lib.cpprob_loader_site_name.restype = ctypes.c_int
        lib.cpprob_loader_site_name.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.cpprob_loader_site_size.restype = ctypes.c_uint32
        lib.cpprob_loader_site_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.cpprob_loader_next_batch.restype = ctypes.c_int
        lib.cpprob_loader_next_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ]
        lib.cpprob_loader_close.argtypes = [ctypes.c_void_p]
        lib.cpprob_posterior_parse.restype = ctypes.c_void_p
        lib.cpprob_posterior_parse.argtypes = [ctypes.c_char_p]
        lib.cpprob_posterior_n_particles.restype = ctypes.c_int64
        lib.cpprob_posterior_n_particles.argtypes = [ctypes.c_void_p]
        lib.cpprob_posterior_n_entries.restype = ctypes.c_int64
        lib.cpprob_posterior_n_entries.argtypes = [ctypes.c_void_p]
        lib.cpprob_posterior_log_weights.restype = ctypes.POINTER(ctypes.c_double)
        lib.cpprob_posterior_log_weights.argtypes = [ctypes.c_void_p]
        lib.cpprob_posterior_offsets.restype = ctypes.POINTER(ctypes.c_int64)
        lib.cpprob_posterior_offsets.argtypes = [ctypes.c_void_p]
        lib.cpprob_posterior_ids.restype = ctypes.POINTER(ctypes.c_int32)
        lib.cpprob_posterior_ids.argtypes = [ctypes.c_void_p]
        lib.cpprob_posterior_values.restype = ctypes.POINTER(ctypes.c_double)
        lib.cpprob_posterior_values.argtypes = [ctypes.c_void_p]
        lib.cpprob_posterior_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_native() is not None


def write_trace_shard(
    directory: str,
    site_values: Dict[str, np.ndarray],   # addr -> (n, ...) float
    obs: np.ndarray,                      # (n, obs_dim)
    name: Optional[str] = None,
) -> str:
    """Write one shard; returns its path (UUID-named like socket.cpp:84)."""
    os.makedirs(directory, exist_ok=True)
    name = name or uuid.uuid4().hex
    path = os.path.join(directory, f"{name}.cptt")
    obs = np.asarray(obs, np.float32)
    n = obs.shape[0]
    names = list(site_values.keys())
    cols = []
    sizes = []
    for addr in names:
        v = np.asarray(site_values[addr], np.float32).reshape(n, -1)
        sizes.append(v.shape[1])
        cols.append(v)
    data = np.concatenate([obs] + cols, axis=1).astype(np.float32)
    with open(path, "wb") as f:
        f.write(struct.pack("<IIIIQ", _MAGIC, 1, len(names), obs.shape[1], n))
        for addr in names:
            b = addr.encode()
            f.write(struct.pack("<I", len(b)))
            f.write(b)
        f.write(struct.pack(f"<{len(sizes)}I", *sizes))
        f.write(data.tobytes())
    return path


def dump_traces(engine, directory: str, key, n_traces: int, shard_size: int = 4096):
    """Generate prior traces with a CSIS engine and dump shards — the offline
    half of ``compile(..., dump_folder=...)`` (``cpprob.hpp:133-139``)."""
    import jax

    paths = []
    remaining = n_traces
    while remaining > 0:
        key, sub = jax.random.split(key)
        n = min(shard_size, remaining)
        values, obs = engine._gen(sub, n)
        masks = values.pop("__masks__", {})
        np_values = {
            k: np.asarray(v, np.float32) for k, v in values.items()
        }
        for addr, m in masks.items():
            np_values[f"__mask__{addr}"] = np.broadcast_to(
                np.asarray(m, np.float32), (n,)
            )
        paths.append(write_trace_shard(directory, np_values, np.asarray(obs)))
        remaining -= n
    return paths


class TraceLoader:
    """Random-minibatch loader over shards (native when possible)."""

    def __init__(
        self,
        paths: Sequence[str],
        batch_size: int,
        n_threads: int = 2,
        seed: int = 0,
        force_python: bool = False,
    ):
        self.paths = list(paths)
        if not self.paths:
            raise ValueError("no shard paths given")
        self.batch_size = batch_size
        self._handle = None
        lib = None if force_python else _load_native()
        if lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            handle = lib.cpprob_loader_open(
                arr, len(self.paths), batch_size, n_threads, seed
            )
            if handle:
                self._handle = ctypes.c_void_p(handle)
                self._lib = lib
        if self._handle is not None:
            lib = self._lib
            self.row_len = int(lib.cpprob_loader_row_len(self._handle))
            self.obs_dim = int(lib.cpprob_loader_obs_dim(self._handle))
            self.total_traces = int(lib.cpprob_loader_total_traces(self._handle))
            n_sites = lib.cpprob_loader_n_sites(self._handle)
            self.site_names = []
            self.site_sizes = []
            buf = ctypes.create_string_buffer(4096)
            for i in range(n_sites):
                lib.cpprob_loader_site_name(self._handle, i, buf, 4096)
                self.site_names.append(buf.value.decode())
                self.site_sizes.append(int(lib.cpprob_loader_site_size(self._handle, i)))
            self.native = True
        else:
            self._py_load()
            self.native = False
        self._rng = np.random.RandomState(seed)

    # -- python fallback -------------------------------------------------
    def _py_load(self):
        self._py_shards = []
        for i, p in enumerate(self.paths):
            with open(p, "rb") as f:
                magic, version, n_sites, obs_dim, n = struct.unpack(
                    "<IIIIQ", f.read(24)
                )
                if magic != _MAGIC or version != 1:
                    raise ValueError(f"bad shard {p}")
                names = []
                for _ in range(n_sites):
                    (ln,) = struct.unpack("<I", f.read(4))
                    names.append(f.read(ln).decode())
                sizes = list(struct.unpack(f"<{n_sites}I", f.read(4 * n_sites)))
                row_len = obs_dim + sum(sizes)
                data = np.frombuffer(
                    f.read(row_len * n * 4), np.float32
                ).reshape(n, row_len)
            if i == 0:
                self.site_names, self.site_sizes = names, sizes
                self.obs_dim, self.row_len = obs_dim, row_len
            elif names != self.site_names or sizes != self.site_sizes:
                raise ValueError(f"incompatible shard {p}")
            self._py_shards.append(data)
        self.total_traces = sum(s.shape[0] for s in self._py_shards)

    def next_batch_raw(self) -> np.ndarray:
        """(batch, row_len) matrix: [obs | site values...]."""
        if self._handle is not None:
            out = np.empty((self.batch_size, self.row_len), np.float32)
            rc = self._lib.cpprob_loader_next_batch(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if rc != 0:
                raise RuntimeError("native loader stopped")
            return out
        shard_idx = self._rng.randint(len(self._py_shards), size=self.batch_size)
        rows = np.empty((self.batch_size, self.row_len), np.float32)
        for i, si in enumerate(shard_idx):
            s = self._py_shards[si]
            rows[i] = s[self._rng.randint(s.shape[0])]
        return rows

    def next_batch(self) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
        """(site_values dict, obs matrix) — the shape csis_loss consumes."""
        raw = self.next_batch_raw()
        obs = raw[:, : self.obs_dim]
        values = {}
        off = self.obs_dim
        for addr, size in zip(self.site_names, self.site_sizes):
            v = raw[:, off : off + size]
            values[addr] = v[:, 0] if size == 1 else v
            off += size
        return values, obs

    def close(self):
        if self._handle is not None:
            self._lib.cpprob_loader_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
