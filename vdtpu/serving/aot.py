"""AOT executable cache: serve the first request without a 2-5 minute jit.

The t2i 50-step scan compiles in 130-300s on the tunneled TPU backend and
the stock persistent compilation cache does not capture this backend's
artifacts (PERF.md). This module persists the *compiled executable itself*
via ``jax.experimental.serialize_executable`` keyed by (signature, jax
version, device kind, code epoch): a warm boot deserializes in seconds
instead of recompiling.

No counterpart in the reference (its first Gradio request eats the CUDA
warmup); this is the TPU-native serving story called for by VERDICT r1
item 9.

Usage: ``CachedCompile(fn, key)`` is a drop-in for ``jax.jit(fn)`` — on
first call it loads the executable from ``$VDTPU_AOT_CACHE`` (or compiles
and stores it); any load/shape mismatch falls back to a fresh compile.
"""
from __future__ import annotations

import hashlib
import os
import pickle
import threading

import jax

# bump when compiled-function semantics change incompatibly
CODE_EPOCH = "1"


def cache_dir() -> str | None:
    return os.environ.get("VDTPU_AOT_CACHE") or None


# env knobs that change the TRACED GRAPH without changing arg avals: a
# cached executable compiled under a different setting would pass the aval
# check and silently serve the wrong variant's numerics/perf
_GRAPH_ENV_KNOBS = ("VDTPU_QCONV", "VDTPU_QCONV_GN", "VDTPU_QKV",
                    "VDTPU_QUANT_BF16", "VDTPU_INT8_MIN_PIXELS")


def _env_tag() -> str:
    dev = jax.devices()[0]
    knobs = ",".join(f"{k}={os.environ.get(k, '')}" for k in _GRAPH_ENV_KNOBS)
    return (f"{jax.__version__}-{dev.platform}-"
            f"{getattr(dev, 'device_kind', '?')}-{CODE_EPOCH}|{knobs}")


def _path(key: str) -> str:
    h = hashlib.sha256(f"{key}|{_env_tag()}".encode()).hexdigest()[:24]
    return os.path.join(cache_dir(), f"exe-{h}.pkl")


class CachedCompile:
    """Lazy lower->compile with on-disk executable persistence.

    key: a stable string identifying the traced computation (the sampler's
    signature tuple repr). Argument shape/dtype mismatches against a cached
    executable raise inside XLA at call time and trigger a recompile.
    """

    def __init__(self, fn, key: str):
        self._fn = fn
        self._key = key
        self._compiled = None
        self._validated = False  # aval check passed once for this executable
        self._lock = threading.Lock()

    def _try_load(self):
        d = cache_dir()
        if d is None:
            return None
        p = _path(self._key)
        if not os.path.exists(p):
            if os.environ.get("VDTPU_AOT_DEBUG"):
                print(f"[aot] MISS {self._key} ({os.path.basename(p)})",
                      file=__import__('sys').stderr, flush=True)
            return None
        try:
            import time as _time
            t0 = _time.perf_counter()
            with open(p, "rb") as f:
                payload, in_tree, out_tree, dev_ids = pickle.load(f)
            t1 = _time.perf_counter()
            from jax.experimental.serialize_executable import deserialize_and_load
            # rebind to the same device ids: deserialize defaults to ALL
            # local devices, which breaks 1-device executables on virtual
            # multi-device hosts
            by_id = {dev.id: dev for dev in jax.devices()}
            devs = [by_id[i] for i in dev_ids] if dev_ids else None
            exe = deserialize_and_load(payload, in_tree, out_tree,
                                       execution_devices=devs)
            if os.environ.get("VDTPU_AOT_DEBUG"):
                print(f"[aot] HIT {self._key}: read {t1 - t0:.1f}s "
                      f"({os.path.getsize(p) >> 20} MiB), deserialize "
                      f"{_time.perf_counter() - t1:.1f}s",
                      file=__import__('sys').stderr, flush=True)
            return exe
        except Exception:
            return None  # stale/corrupt/foreign-topology: recompile below

    def _store(self, compiled):
        d = cache_dir()
        if d is None:
            return
        try:
            from jax.experimental.serialize_executable import serialize
            payload, in_tree, out_tree = serialize(compiled)
            try:
                # first LEAF sharding: input_shardings[0] mirrors the arg
                # pytree, so its [0] element can be a dict (params trees) —
                # indexing it directly raised and stored dev_ids=None, which
                # made deserialize bind ALL local devices on virtual
                # multi-device hosts (the executable then demands N-sharded
                # args and no longer accepts single-device arrays)
                shards = jax.tree_util.tree_leaves(compiled.input_shardings[0])
                dev_ids = sorted(d.id for d in shards[0].device_set) if shards \
                    else [jax.devices()[0].id]
            except Exception:
                dev_ids = None
            os.makedirs(d, exist_ok=True)
            p = _path(self._key)
            tmp = p + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree, dev_ids), f)
            os.replace(tmp, p)
        except Exception:
            pass  # cache is an optimization; never fail the request

    def _compile(self, args):
        compiled = jax.jit(self._fn).lower(*args).compile()
        self._store(compiled)
        return compiled

    def _signature_mismatch(self, args) -> bool:
        """True when the args' avals differ from the cached executable's.

        Checked BEFORE invoking: a blanket except around the call would
        mask genuine runtime failures (OOM, transfer errors) behind a
        confusing minutes-long recompile-then-fail cycle (ADVICE r2)."""
        try:
            info = jax.tree_util.tree_leaves(self._compiled.args_info)
            flat = jax.tree_util.tree_leaves(args)
            if len(info) != len(flat):
                return True
            from jax.api_util import shaped_abstractify
            for i, a in zip(info, flat):
                aval = shaped_abstractify(a)
                if (tuple(i.shape) != tuple(aval.shape)
                        or i.dtype != aval.dtype):
                    return True
            return False
        except Exception:
            return False  # introspection unavailable: call as-is

    @staticmethod
    def _is_signature_drift(e: Exception) -> bool:
        """Errors that mean 'this executable doesn't match these args/this
        topology' (recompile-able), as opposed to genuine runtime failures
        (OOM / transfer errors / NaN guards) which must propagate."""
        if isinstance(e, TypeError):
            return "compiled" in str(e)
        return "INVALID_ARGUMENT" in str(e)

    def warm(self) -> bool:
        """Pay the one-time program-load tax ahead of traffic.

        Loads the cached executable (if present) and executes it ONCE on
        all-zero arguments constructed from its own ``args_info`` — no real
        params/conditioning needed, so a serving boot can run this in a
        background thread WHILE the param fill / int8 calibration / VAE
        init proceed (VERDICT r4 task 2: overlap ``latency_exe_warmup``
        with the dispatch-bound init phases). Outputs are discarded; safe
        for any pure jitted fn. Returns False on a cache miss (cold boot:
        nothing to warm — the normal compile path pays load implicitly)."""
        with self._lock:
            if self._compiled is None:
                self._compiled = self._try_load()
        if self._compiled is None:
            return False
        try:
            import jax.numpy as jnp
            info = self._compiled.args_info  # ((arg0_tree, ...), kwargs)
            leaves_i, treedef = jax.tree_util.tree_flatten(info)
            shapes = [(tuple(i.shape), i.dtype) for i in leaves_i]
            # one jitted graph creates every dummy leaf on-device (per-leaf
            # eager zeros would be dispatch-bound through the tunnel)
            leaves = jax.jit(lambda: [jnp.zeros(s, d) for s, d in shapes])()
            try:
                args, kwargs = jax.tree_util.tree_unflatten(treedef, leaves)
                out = self._compiled(*args, **kwargs)
            except (TypeError, ValueError, jax.errors.JaxRuntimeError):
                # a deserialized executable can bind MORE devices than its
                # sharding metadata claims (virtual multi-device hosts) and
                # then rejects committed single-device arrays instead of
                # resharding them. Eager zeros are UNCOMMITTED — jax
                # reshards those to whatever the runtime expects (the same
                # reason real request arrays work). Dispatch-bound, but
                # this path never triggers on a 1-device chip.
                leaves = [jnp.zeros(s, d) for s, d in shapes]
                args, kwargs = jax.tree_util.tree_unflatten(treedef, leaves)
                out = self._compiled(*args, **kwargs)
            jax.block_until_ready(out)
            # leave _validated False: the first REAL call still runs the
            # aval precheck, so a stale cached signature recompiles there
            return True
        except Exception:
            # a warm failure must never break boot: the real first call
            # below recompiles/validates as usual
            if os.environ.get("VDTPU_AOT_DEBUG"):
                import traceback
                traceback.print_exc()
            return False

    def __call__(self, *args):
        if self._compiled is None:
            with self._lock:
                if self._compiled is None:
                    self._compiled = self._try_load() or self._compile(args)
        # the per-leaf aval walk costs tens of ms on large param trees:
        # run it until it passes once, then trust the executable (repeat
        # calls with new shapes surface as signature-drift errors below)
        if not self._validated:
            if self._signature_mismatch(args):
                # stale cached executable (shape/dtype drift): recompile once
                with self._lock:
                    self._compiled = self._compile(args)
            self._validated = True
        try:
            return self._compiled(*args)
        except (TypeError, jax.errors.JaxRuntimeError) as e:
            # drift the aval check can't see (e.g. an executable deserialized
            # for a different device topology reports INVALID_ARGUMENT shard
            # counts); anything else is a real failure and propagates
            if not self._is_signature_drift(e):
                raise
            with self._lock:
                self._compiled = self._compile(args)
                self._validated = False
            return self._compiled(*args)
