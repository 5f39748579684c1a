"""Deterministic cache keys for Pallas programs (utils/cache_keys.py).

The Mosaic payload in tpu_custom_call embeds process-lowering-history-
dependent debug info, so stock JAX computes a different persistent-cache
key for the same program in different processes — every Pallas program
recompiles per process. The canonicalizer must make keys history-
independent while still distinguishing genuinely different kernels.
"""

import subprocess
import sys

import pytest

CHILD = r'''
import sys, functools, hashlib
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax import export as jexport
from jax._src import cache_key as ck
import fastest_image_pattern_matching_tpu  # installs the stable keys
from fastest_image_pattern_matching_tpu.ops.pallas.warp_kernel import (
    warp_affine_pallas)

prelower, out_h = sys.argv[1] == "1", int(sys.argv[2])
if prelower:
    # Pollute the process's lowering history with unrelated kernels.
    for hw, ohw in (((100, 140), (24, 40)), ((120, 160), (48, 64))):
        f0 = jax.jit(functools.partial(warp_affine_pallas, out_hw=ohw,
                                       border_value=0.0, quantize=True))
        jexport.export(f0, platforms=("tpu",))(
            jnp.zeros(hw, jnp.float32), jnp.zeros((2, 2, 3), jnp.float32))

fn = jax.jit(functools.partial(warp_affine_pallas, out_hw=(out_h, 30),
                               border_value=0.0, quantize=True))
lo = fn.trace(jnp.zeros((200, 260), jnp.float32),
              jnp.zeros((3, 2, 3), jnp.float32)).lower(
    lowering_platforms=("tpu",))
m = lo._lowering.stablehlo()
h = hashlib.sha256()
ck._hash_computation(h, m, ck.IgnoreCallbacks.NO)
print(h.hexdigest())
'''


def _key(prelower: bool, out_h: int = 23) -> str:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, "1" if prelower else "0", str(out_h)],
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-800:]
    return out.stdout.strip().splitlines()[-1]


def test_key_stable_across_lowering_history():
    assert _key(False) == _key(True)


def test_key_distinguishes_different_kernels():
    assert _key(False, out_h=23) != _key(False, out_h=24)


def test_install_idempotent_and_active():
    from fastest_image_pattern_matching_tpu.utils.cache_keys import (
        install_stable_pallas_cache_keys)
    assert install_stable_pallas_cache_keys()
    assert install_stable_pallas_cache_keys()
    from jax._src import cache_key as ck
    assert ck._hash_computation.__name__ == "_hash_computation_stable"


def test_non_pallas_module_bypasses():
    """Modules without tpu_custom_call must hash via the original path
    (canonicalizer returns None)."""
    import jax
    import jax.numpy as jnp
    from fastest_image_pattern_matching_tpu.utils.cache_keys import (
        _strip_payload_debuginfo)
    lo = jax.jit(lambda x: x * 2 + 1).trace(
        jnp.zeros((8, 8), jnp.float32)).lower()
    m = lo._lowering.stablehlo()
    assert _strip_payload_debuginfo(m) is None
