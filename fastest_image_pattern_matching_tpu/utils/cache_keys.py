"""Deterministic persistent-cache keys for Pallas/Mosaic programs.

Root cause (diagnosed in round 3 on the axon TPU): the Mosaic kernel
payload inside `tpu_custom_call`'s backend_config is the kernel module
serialized WITH debug info (jax._src.tpu_custom_call: get_asm(...,
enable_debug_info=True)). The location table in that inner bytecode
depends on how many programs the process lowered EARLIER (MLIR context
interning state), so the same match program hashes to a different
compilation-cache key in every process with a different lowering
history. JAX's own key canonicalization strips debug info from the
OUTER module only — it cannot reach inside the payload string. Result:
every Pallas-containing program misses the persistent cache across
processes (observed: identical-size executables re-written under new
keys per fresh process; pure-XLA programs hit fine).

Fix: before hashing, rewrite each tpu_custom_call backend_config body
to its strip-debuginfo'd bytecode (parsed in a fresh context). Only the
HASH sees the rewritten module; the program XLA compiles is untouched.
Verified: canonical hashes match across processes with different
lowering histories, and differ for genuinely different kernels
(tests/test_cache_keys.py).

install_stable_pallas_cache_keys() is called from the package __init__
(kill switch: FIPM_STABLE_CACHE_KEYS=0); it is idempotent and falls
back to stock hashing on any error.
"""

from __future__ import annotations

import base64
import io
import json
import logging

logger = logging.getLogger(__name__)

_installed = False


def _strip_payload_debuginfo(module):
    """Clone `module` with every tpu_custom_call Mosaic payload replaced
    by its strip-debuginfo'd serialization. Returns None if the module
    has no such payloads (caller should hash the original)."""
    from jax._src.lib.mlir import ir
    from jax._src.lib.mlir import passmanager as pm

    found = [False]

    def detect(op):
        if op.name == "stablehlo.custom_call" and \
                "backend_config" in op.attributes:
            found[0] = True
            return ir.WalkResult.INTERRUPT
        return ir.WalkResult.ADVANCE

    module.operation.walk(detect)
    if not found[0]:
        return None

    with module.context:
        clone = ir.Module.parse(module.operation.get_asm(binary=True))

        def rewrite(op):
            if op.name != "stablehlo.custom_call" or \
                    "backend_config" not in op.attributes:
                return ir.WalkResult.ADVANCE
            try:
                cfg = json.loads(
                    ir.StringAttr(op.attributes["backend_config"]).value)
                body = cfg.get("custom_call_config", {}).get("body")
                if not body:
                    return ir.WalkResult.ADVANCE
                raw = base64.b64decode(body)
                with ir.Context() as c2:
                    c2.allow_unregistered_dialects = True
                    inner = ir.Module.parse(raw)
                    pm.PassManager.parse(
                        "builtin.module(strip-debuginfo)").run(
                        inner.operation)
                    buf = io.BytesIO()
                    inner.operation.write_bytecode(buf)
                cfg["custom_call_config"]["body"] = base64.b64encode(
                    buf.getvalue()).decode()
                op.attributes["backend_config"] = ir.StringAttr.get(
                    json.dumps(cfg, sort_keys=True))
            except Exception as e:  # non-JSON/opaque configs: leave as-is
                logger.debug("payload canonicalization skipped: %r", e)
            return ir.WalkResult.ADVANCE

        clone.operation.walk(rewrite)
        return clone


def install_stable_pallas_cache_keys() -> bool:
    """Monkeypatch jax's cache-key computation to canonicalize Mosaic
    payloads. Idempotent; returns True if active."""
    global _installed
    if _installed:
        return True
    try:
        from jax._src import cache_key as ck
    except Exception as e:
        logger.warning("stable cache keys unavailable: %r", e)
        return False
    # A JAX version that renames/removes the private hook must degrade to
    # stock hashing, not break package import (the documented contract).
    orig = getattr(ck, "_hash_computation", None)
    if orig is None:
        logger.warning("stable cache keys unavailable: "
                       "jax._src.cache_key._hash_computation missing")
        return False

    def _hash_computation_stable(hash_obj, module, *args, **kw):
        try:
            canon = _strip_payload_debuginfo(module)
        except Exception as e:
            logger.debug("cache-key canonicalization failed: %r", e)
            canon = None
        orig(hash_obj, canon if canon is not None else module, *args, **kw)

    ck._hash_computation = _hash_computation_stable
    _installed = True
    return True
