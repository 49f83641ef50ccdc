"""AOT executable cache: persist compiled TPU programs across processes.

The axon remote compiler does not persist big executables, so every fresh
serving/CLI process re-pays ~650 s of pipeline compiles (CLAUDE.md,
scripts/probe_cold_start.py). JAX's AOT path does cross the process
boundary: ``jit(f).lower(*args).compile()`` + ``jax.experimental.
serialize_executable`` round-trips the compiled PJRT executable through a
file — measured on the full-size stage-2 denoise scan: 271 MB payload,
deserialize 4.0 s, first call 0.02 s, zero recompile
(scripts/probe_aot.py, round 5).

``aot_jit(fn, static_argnames=...)`` is a drop-in replacement for
``jax.jit`` at a def site. It delegates to a plain ``jax.jit`` until
``configure(cache_dir)`` is called (the ``--aot_cache`` opt-in in
run.py/serve.py); after that, each specialization (static values + dynamic
arg avals) is loaded from ``cache_dir`` when present, else compiled once
and serialized there. Any failure along the AOT path (unsupported
serialization, stale payload, unhashable static) logs once and falls back
to the plain jit — the cache can only make cold starts faster, never
break a run.

Scope guards: specializations whose statics include a live
``jax.sharding.Mesh`` are never AOT-cached (multi-chip executables bake
device assignments; the single-chip serving path is the target). Cache
entries key on the lowered StableHLO CONTENT plus JAX version + backend
platform, so editing model code, upgrading JAX, or switching CPU<->TPU
misses cleanly instead of loading a stale or incompatible payload —
tracing+lowering on a cache hit costs seconds, two orders of magnitude
under the remote compile it replaces.
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import logging
import os
import pickle
import threading
from typing import Any, Dict, Optional, Tuple

import jax

log = logging.getLogger(__name__)

_KEY_VERSION = "aot-v1"
_state = {"dir": None, "backend": None, "max_bytes": None,
          "loaded": 0, "compiled": 0, "loaded_mb": 0.0}
_registry = []   # every _AotFn, so configure() can reset their memo tables


def configure(cache_dir: Optional[str], backend: Optional[str] = None,
              max_bytes: Optional[int] = None) -> None:
    """Enable (or, with ``None``, disable) the on-disk executable cache.

    ``backend``: PJRT platform name for deserialization (default: the
    process's default backend). ``max_bytes``: evict oldest-used entries
    past this total size after each save (full-size programs are
    ~0.1-0.3 GB each; stale content-keyed entries accumulate as code
    changes). Call before the first pipeline dispatch; re-configuring
    resets the in-memory memo tables and the load/compile stats."""
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
    _state.update(dir=cache_dir, backend=backend, max_bytes=max_bytes,
                  loaded=0, compiled=0, loaded_mb=0.0)
    for f in _registry:
        f._mem.clear()
        f._broken = False


def cache_dir() -> Optional[str]:
    return _state["dir"]


def stats() -> dict:
    """This process's cache activity since configure(): executables
    deserialized from disk vs compiled (and serialized), and MB read."""
    return {"loaded": _state["loaded"], "compiled": _state["compiled"],
            "loaded_mb": round(_state["loaded_mb"], 1)}


def _evict_to_budget(keep: str) -> None:
    """Oldest-accessed-first eviction past max_bytes; the entry just
    written (``keep``) is never evicted, so the cap can only trim OTHER
    (stale) entries."""
    if not _state["max_bytes"] or _state["dir"] is None:
        return
    entries = []
    for name in os.listdir(_state["dir"]):
        if name.endswith(".aotx"):
            p = os.path.join(_state["dir"], name)
            if os.path.abspath(p) == os.path.abspath(keep):
                continue
            try:
                st = os.stat(p)
                entries.append((st.st_atime, st.st_size, p))
            except OSError:
                pass
    total = sum(s for _, s, _ in entries) + os.path.getsize(keep)
    for atime, size, p in sorted(entries):
        if total <= _state["max_bytes"]:
            break
        try:
            os.remove(p)
            total -= size
            log.info("aot: evicted %s (%.1f MB, cache over %.0f MB cap)",
                     os.path.basename(p), size / 1e6,
                     _state["max_bytes"] / 1e6)
        except OSError:
            pass


def _leaf_desc(x) -> Tuple:
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        return (tuple(x.shape), str(x.dtype))
    # python scalars are weak-typed dynamic avals: the VALUE does not
    # specialize the program, only the type does (matches jax.jit)
    return ("py", type(x).__name__)


def _is_mesh(v) -> bool:
    from jax.sharding import Mesh
    try:
        from jax.sharding import AbstractMesh
        return isinstance(v, (Mesh, AbstractMesh))
    except ImportError:
        return isinstance(v, Mesh)


class _AotFn:
    """jax.jit twin with a disk-backed executable cache (see module doc)."""

    def __init__(self, fn, static_argnames: Tuple[str, ...]):
        self._fn = fn
        self._name = getattr(fn, "__name__", "fn")
        self._jit = jax.jit(fn, static_argnames=static_argnames)
        self._static = tuple(static_argnames)
        params = list(inspect.signature(fn).parameters)
        self._static_pos = {params.index(n): n for n in self._static
                            if n in params}
        self._mem: Dict[Any, Any] = {}
        self._broken = False
        self._lock = threading.Lock()
        functools.update_wrapper(self, fn)
        _registry.append(self)

    # probes / callers that want the raw jit surface
    def lower(self, *args, **kwargs):
        return self._jit.lower(*args, **kwargs)

    def _split(self, args, kwargs):
        """(statics {name: val}, dyn_args tuple, dyn_kwargs dict) — statics
        may arrive positionally or by keyword; dynamics keep their relative
        order, which is also the order ``Compiled.__call__`` expects (the
        lowered in_tree excludes statics)."""
        statics, dyn = {}, []
        for i, a in enumerate(args):
            n = self._static_pos.get(i)
            if n is not None:
                statics[n] = a
            else:
                dyn.append(a)
        dyn_kw = {}
        for k, v in kwargs.items():
            if k in self._static:
                statics[k] = v
            else:
                dyn_kw[k] = v
        return statics, tuple(dyn), dyn_kw

    def __call__(self, *args, **kwargs):
        if _state["dir"] is None or self._broken:
            return self._jit(*args, **kwargs)
        try:
            statics, dyn_args, dyn_kw = self._split(args, kwargs)
            if any(_is_mesh(v) for v in statics.values()):
                return self._jit(*args, **kwargs)
            leaves, treedef = jax.tree.flatten((dyn_args, dyn_kw))
            # device identity: multi-stream serving commits each stream's
            # arrays to its own chip; executables bind to devices, so the
            # key must separate them (first array leaf is representative —
            # mixed-device calls would fail under plain jit too)
            dev = next((tuple(sorted(d.id for d in x.devices()))
                        for x in leaves if hasattr(x, "devices")), None)
            # treedef objects hash in C++ — much cheaper per call than str()
            memkey = (tuple(sorted(statics.items())), treedef,
                      tuple(_leaf_desc(x) for x in leaves), dev)
        except TypeError:            # unhashable static value
            return self._jit(*args, **kwargs)
        compiled = self._mem.get(memkey)
        if compiled is None:
            with self._lock:
                compiled = self._mem.get(memkey)
                if compiled is None:
                    compiled = self._load_or_build(memkey, args, kwargs)
                    if compiled is None:       # AOT path broke: plain jit
                        return self._jit(*args, **kwargs)
                    self._mem[memkey] = compiled
        return compiled(*dyn_args, **dyn_kw)

    # -- disk layer ----------------------------------------------------------

    def _disk_key(self, memkey, lowered) -> str:
        """CONTENT-keyed: hashes the lowered StableHLO alongside the
        signature, so editing model code between processes misses cleanly
        instead of silently loading a stale executable. Tracing+lowering
        costs seconds per program — two orders of magnitude under the
        remote compile it replaces."""
        statics, treedef, leafdescs, dev = memkey
        backend = _state["backend"] or jax.default_backend()
        h = hashlib.sha256(repr(
            (_KEY_VERSION, jax.__version__, backend, self._name,
             [(k, repr(v)) for k, v in statics], str(treedef),
             leafdescs, dev)).encode())
        h.update(lowered.as_text().encode())
        return h.hexdigest()[:20]

    def _load_or_build(self, memkey, args, kwargs):
        try:
            lowered = self._jit.lower(*args, **kwargs)
        except Exception as e:
            log.warning("aot: lower of %s failed (%s: %s); falling back to "
                        "jax.jit", self._name, type(e).__name__, e)
            self._broken = True
            return None
        path = os.path.join(
            _state["dir"], f"{self._name}-{self._disk_key(memkey, lowered)}.aotx")
        if os.path.exists(path):
            try:
                from jax.experimental.serialize_executable import (
                    deserialize_and_load)
                with open(path, "rb") as fh:
                    blob = pickle.load(fh)
                platform = blob.get("platform")
                # pin to the ORIGINAL device(s): without execution_devices
                # the executable binds to every addressable device of the
                # client (observed on the 8-dev virtual CPU mesh: "expected
                # 8 shards"); with them, a multi-stream server's per-chip
                # entries land back on their own chips. Multi-device mesh
                # programs never reach this path (mesh bypass).
                devs = {d.id: d for d in jax.local_devices(backend=platform)}
                want = blob.get("device_ids") or [min(devs)]
                compiled = deserialize_and_load(
                    blob["payload"], blob["in_tree"], blob["out_tree"],
                    backend=platform,
                    execution_devices=[devs[i] for i in want])
                mb = os.path.getsize(path) / 1e6
                _state["loaded"] += 1
                _state["loaded_mb"] += mb
                log.info("aot: loaded %s (%.1f MB)",
                         os.path.basename(path), mb)
                return compiled
            except Exception as e:       # stale/corrupt entry: recompile
                log.warning("aot: load of %s failed (%s: %s); recompiling",
                            path, type(e).__name__, e)
        try:
            compiled = lowered.compile()
            _state["compiled"] += 1
        except Exception as e:
            log.warning("aot: compile of %s failed (%s: %s); "
                        "falling back to jax.jit", self._name,
                        type(e).__name__, e)
            self._broken = True
            return None
        try:
            from jax.experimental.serialize_executable import serialize
            payload, in_tree, out_tree = serialize(compiled)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as fh:
                pickle.dump({"payload": payload, "in_tree": in_tree,
                             "out_tree": out_tree,
                             "device_ids": list(memkey[3] or ()),
                             "platform": _state["backend"]
                             or jax.default_backend()}, fh)
            os.replace(tmp, path)
            log.info("aot: saved %s (%.1f MB)", os.path.basename(path),
                     os.path.getsize(path) / 1e6)
            _evict_to_budget(path)
        except Exception as e:           # serialization unsupported: still
            log.warning("aot: serialize of %s failed (%s: %s); executable "
                        "used uncached", self._name, type(e).__name__, e)
        return compiled


def aot_jit(fn=None, *, static_argnames: Tuple[str, ...] = ()):
    """``jax.jit`` drop-in whose specializations persist across processes
    once ``configure(dir)`` is called (no-op pass-through otherwise)."""
    if fn is None:
        return functools.partial(aot_jit, static_argnames=static_argnames)
    if isinstance(static_argnames, str):
        static_argnames = (static_argnames,)
    return _AotFn(fn, tuple(static_argnames))
