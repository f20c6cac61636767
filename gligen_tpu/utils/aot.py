"""AOT-serialized executable cache for the fixed serving programs.

The persistent XLA compilation cache (utils/cache.py) still pays a
compile step on every boot — measured 97.6 s for ONE SD-scale UNet
forward on the axon remote compiler, vs **2.5 s** to
``deserialize_and_load`` the same executable from a pickled payload
(``tools/aot_probe.py``, 2026-08-19, AOT_SUPPORTED).  Serving runs a
small fixed set of (batch, resolution, sampler-statics) programs, so we
can serialize each compiled executable to disk once and boot a server in
seconds instead of minutes (the reference has no equivalent: its torch
demo pays full module init + CUDA warmup per boot, demo/app.py).

Usage: ``AotCache(dir).wrap(fn, name)`` returns a jit-like callable.  On
first call per argument-shape signature it tries ``<dir>/<digest>.aotx``;
a miss lowers + compiles + serializes.  The digest covers everything
that can change the compiled program:

  - the wrapper ``name`` (encodes the pipeline statics tuple),
  - the argument pytree structure + leaf shapes/dtypes,
  - jax/jaxlib versions, backend platform + device kind + device count,
  - every ``GLIGEN_TPU_*`` env knob (kernel routing changes programs),
  - a content hash of the ``gligen_tpu`` package sources (stale
    executables from an older code revision must never load).

Any failure on the load or save path degrades to plain jit-compile —
the cache is an optimization, never a correctness dependency.

The directory is bounded: payloads are large (one full 512² pipeline
executable is ~737 MB) and the warmup matrix (buckets × resolutions ×
modalities × head/tail programs) multiplies them, so the cache evicts
least-recently-used entries past ``GLIGEN_TPU_AOT_MAX_GB`` (default 24)
after every save.  Recency = file mtime, refreshed on every load hit, so
the working set of a long-lived server survives eviction pressure.

Trust boundary: entries are Python pickles (the payload wraps XLA's
serialized executable plus jax pytree defs — there is no pickle-free
wire format for these), so LOADING AN ENTRY EXECUTES CODE FROM THE
FILE.  The cache directory must be writable only by operators trusted
to run code in the serving process; it is created ``0o700`` and should
only be shared between servers inside one trust domain.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import warnings
from typing import Any, Dict, Optional

_FORMAT_VERSION = 1
_pkg_hash_cache: Optional[str] = None


def _package_hash() -> str:
    """Content hash of every .py in the gligen_tpu package (~10 ms)."""
    global _pkg_hash_cache
    if _pkg_hash_cache is None:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for root, _dirs, files in sorted(os.walk(pkg)):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    # package-relative path: two installs of identical code
                    # at different prefixes (venvs, containers) must share
                    # digests or a shared --aot_dir silently never hits
                    h.update(os.path.relpath(p, pkg).encode())
                    with open(p, "rb") as fh:
                        h.update(fh.read())
        _pkg_hash_cache = h.hexdigest()[:16]
    return _pkg_hash_cache


# env vars that change what XLA compiles without touching jax.config;
# an executable cached under one flag set must not load under another
_XLA_ENV_KEYS = (
    "XLA_FLAGS", "LIBTPU_INIT_ARGS", "TPU_LIBRARY_PATH",
    "JAX_ENABLE_X64", "JAX_DEFAULT_MATMUL_PRECISION", "JAX_PLATFORMS",
)
# cache-policy knobs that do NOT affect compiled code
_NON_PROGRAM_KEYS = ("GLIGEN_TPU_AOT_DIR", "GLIGEN_TPU_AOT_MAX_GB")


def _env_signature() -> str:
    knobs = sorted(
        (k, v) for k, v in os.environ.items()
        if k.startswith("GLIGEN_TPU_") and k not in _NON_PROGRAM_KEYS
    )
    xla = [(k, os.environ.get(k, "")) for k in _XLA_ENV_KEYS]
    return repr(knobs + xla)


def _backend_signature() -> str:
    import jax

    devs = jax.devices()
    # global jax config that changes compiled code must key the digest
    # (tests pin matmul precision to HIGHEST; serving runs the default)
    cfg = (
        jax.config.jax_default_matmul_precision,
        jax.config.jax_enable_x64,
        jax.config.jax_numpy_dtype_promotion,
    )
    return f"{jax.__version__}|{devs[0].platform}|{devs[0].device_kind}|{len(devs)}|{cfg}"


def _args_signature(args: tuple) -> str:
    import jax

    leaves, treedef = jax.tree.flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        shape = getattr(leaf, "shape", None)
        dtype = getattr(leaf, "dtype", None)
        sharding = getattr(leaf, "sharding", None)
        parts.append(f"{shape}:{dtype}:{sharding}")
    return "|".join(parts)


_DEFAULT_MAX_GB = 24.0


class AotCache:
    """Directory of serialized serving executables (``*.aotx`` files),
    LRU-bounded to ``max_bytes`` (see module docstring)."""

    def __init__(self, directory: str, max_bytes: Optional[int] = None):
        self.dir = directory
        os.makedirs(directory, mode=0o700, exist_ok=True)
        if max_bytes is None:
            gb = float(os.environ.get("GLIGEN_TPU_AOT_MAX_GB", _DEFAULT_MAX_GB))
            max_bytes = int(gb * 1e9)
        self.max_bytes = max_bytes
        # surfaced in serving /metrics as "aot_cache"
        self.stats = {"hits": 0, "misses": 0, "errors": 0,
                      "evictions": 0, "size_bytes": self._size_bytes()}

    @staticmethod
    def from_env() -> Optional["AotCache"]:
        path = os.environ.get("GLIGEN_TPU_AOT_DIR")
        return AotCache(path) if path else None

    # ---- size bound ----
    def _entries(self):
        """[(path, size, mtime)] of every .aotx currently on disk."""
        out = []
        try:
            names = os.listdir(self.dir)
        except OSError:
            return out
        for f in names:
            if f.endswith(".aotx"):
                p = os.path.join(self.dir, f)
                try:
                    st = os.stat(p)
                except OSError:  # concurrent eviction by another server
                    continue
                out.append((p, st.st_size, st.st_mtime))
        return out

    def _size_bytes(self) -> int:
        return sum(size for _, size, _ in self._entries())

    def _evict(self):
        """Drop least-recently-used entries until under max_bytes.

        mtime is the recency clock: ``load`` touches entries on hit, so a
        long-lived server's working set stays newest.  Eviction errors are
        ignored (another process may have removed the file first)."""
        entries = self._entries()
        total = sum(size for _, size, _ in entries)
        if total > self.max_bytes:
            for p, size, _ in sorted(entries, key=lambda e: e[2]):
                if total <= self.max_bytes:
                    break
                try:
                    os.remove(p)
                    total -= size
                    self.stats["evictions"] += 1
                except OSError:
                    pass
        self.stats["size_bytes"] = total

    def wrap(self, fn, name: str) -> "_AotJit":
        return _AotJit(fn, name, self)

    # ---- payload IO ----
    def _path(self, digest: str) -> str:
        return os.path.join(self.dir, f"{digest}.aotx")

    def load(self, digest: str):
        path = self._path(digest)
        if not os.path.exists(path):
            self.stats["misses"] += 1
            return None
        try:
            import jax
            from jax.experimental.serialize_executable import deserialize_and_load

            with open(path, "rb") as f:
                blob = pickle.load(f)
            if blob["format"] != _FORMAT_VERSION:
                raise ValueError(f"format {blob['format']} != {_FORMAT_VERSION}")
            # deserialize_and_load defaults execution_devices to ALL client
            # devices; an executable compiled for 1 device then fails at
            # dispatch on a multi-device client ("expected N shards").  Pin
            # the device set the executable was actually compiled for.
            by_id = {d.id: d for d in jax.devices()}
            devices = [by_id[i] for i in blob["device_ids"]]
            exe = deserialize_and_load(
                blob["payload"], blob["in_tree"], blob["out_tree"],
                execution_devices=devices,
            )
            self.stats["hits"] += 1
            os.utime(path)  # refresh LRU recency on hit
            return exe
        except Exception as e:  # stale/corrupt/unsupported: recompile
            self.stats["errors"] += 1
            warnings.warn(f"AOT cache load failed for {os.path.basename(path)}: {e}")
            return None

    def save(self, digest: str, compiled) -> bool:
        try:
            from jax.experimental.serialize_executable import serialize

            payload, in_tree, out_tree = serialize(compiled)
            blob = {
                "format": _FORMAT_VERSION,
                "payload": payload,
                "in_tree": in_tree,
                "out_tree": out_tree,
                "device_ids": [
                    d.id for d in compiled._executable.xla_executable.local_devices()
                ],
            }
            tmp = self._path(digest) + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)
            os.replace(tmp, self._path(digest))  # atomic: concurrent boots race safely
            self._evict()
            return True
        except Exception as e:  # backend without serialization, full disk, ...
            self.stats["errors"] += 1
            warnings.warn(f"AOT cache save failed: {e}")
            return False


class _AotJit:
    """jit-like wrapper that fills/loads an AotCache per argument signature."""

    def __init__(self, fn, name: str, cache: AotCache):
        import jax

        self._jit = jax.jit(fn)
        self._name = name
        self._cache = cache
        self._execs: Dict[str, Any] = {}

    def _digest(self, args: tuple) -> str:
        material = "\n".join([
            str(_FORMAT_VERSION), self._name, _args_signature(args),
            _backend_signature(), _env_signature(), _package_hash(),
        ])
        return hashlib.sha256(material.encode()).hexdigest()[:32]

    def __call__(self, *args):
        try:
            digest = self._digest(args)
        except Exception:  # unhashable args: plain jit
            return self._jit(*args)
        exe = self._execs.get(digest)
        if exe is None:
            exe = self._cache.load(digest)
            if exe is None:
                exe = self._jit.lower(*args).compile()
                self._cache.save(digest, exe)
            self._execs[digest] = exe
        return exe(*args)

    # parity with jax.jit's AOT API for tests/warmup introspection
    def lower(self, *args):
        return self._jit.lower(*args)
