"""On-device gdMlp fused-kernel parity at the REAL serving shapes.

ADVICE r4: the 3-slice+shift tap form in ops/gdmlp_fused.py relies on
maskl/maskr zeroing the block-edge positions; interpret-mode tests cannot
see a Mosaic misalignment of the 127-offset slice against the 128-lane
tile. This script runs gdmlp_fused_cf vs the jnp composition oracle
(_gdmlp_ref) ON THE CHIP at every serving shape the bench pipeline hits
(IE levels L0/L1 and CG levels; the C=160 bottleneck stays NHWC and does
not take this kernel) and prints max abs/rel error per shape.

Run: python tools/gdmlp_device_parity.py  (needs the TPU tunnel)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from bem_tpu.ops.gdmlp_fused import _gdmlp_ref, gdmlp_fused_cf

# (label, B, C, H, W) — bench pipeline shapes (448x640 padded input, K*NIMG
# folded into B at the kernel callsite is irrelevant to tap alignment; use
# B=2 to keep device time small)
SHAPES = [
    ("IE-L0", 2, 40, 448, 640),
    ("IE-L1", 2, 80, 224, 320),
    ("CG-L0", 2, 40, 28, 40),
    ("CG-L1", 2, 80, 14, 20),
]


def main():
    assert jax.devices()[0].platform != "cpu", "needs the real chip"
    ok = True
    for label, B, C, H, W in SHAPES:
        h2 = 4 * C
        rng = np.random.default_rng(hash(label) % 2**31)
        x = jnp.asarray(rng.standard_normal((B, C, H * W)) * 0.5, jnp.bfloat16)
        W1 = jnp.asarray(rng.standard_normal((h2, C)) * 0.2, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((h2,)) * 0.1, jnp.float32)
        dw = jnp.asarray(rng.standard_normal((h2, 9)) * 0.2, jnp.float32)
        W2 = jnp.asarray(rng.standard_normal((C, h2 // 2)) * 0.2, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.float32)
        lns = jnp.asarray(1.0 + 0.1 * rng.standard_normal((C,)), jnp.float32)
        lnb = jnp.asarray(0.1 * rng.standard_normal((C,)), jnp.float32)
        args = (x, W1, b1, dw, None, W2, b2, H, W, lns, lnb, True)
        got = np.asarray(jax.jit(
            lambda *a: gdmlp_fused_cf(*a, H, W, lns, lnb, True)
        )(x, W1, b1, dw, None, W2, b2), np.float32)
        exp = np.asarray(_gdmlp_ref(*args), np.float32)
        aerr = float(np.max(np.abs(got - exp)))
        scale = float(np.max(np.abs(exp))) + 1e-8
        rerr = aerr / scale
        line_ok = rerr < 3e-2
        ok &= line_ok
        print(f"{label:6s} B{B} C{C} {H}x{W}: max_abs={aerr:.4e} "
              f"rel={rerr:.4e} {'OK' if line_ok else 'FAIL'}")
    print("PARITY", "OK" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
