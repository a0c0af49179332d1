"""Chip check for the fused whole-layer int8 kernels after the VMEM
CompilerParams fix (ADVICE r3 medium): the kernels must (a) still
compile + match the op-chain at the serving qwen shape (d=1024,
i=3072, 9.4 MB weights), and (b) now compile at a shape whose resident
weights land BETWEEN the Mosaic default cap (~16 MB) and the 48 MiB
gate (d=2048, i=6144: 36 MB) — previously _fused_layer_ok selected the
kernel there and the compile died with VMEM exhaustion.

Also re-checks parity after the bf16 round-trip numerics fix
(ADVICE r3 low): kernel output vs encoder/model.py's op-chain.
"""

import time

import numpy as np


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def main():
    import jax
    import jax.numpy as jnp

    from theoremsearch_tpu.encoder.model import (
        _mlp_int8,
        _quant_weight,
        _rms_norm,
    )
    from theoremsearch_tpu.kernels.layer_int8 import (
        fused_layer_shapes_ok,
        fused_mlp_int8_layer,
    )

    rng = np.random.default_rng(0)
    for d, i in ((1024, 3072), (2048, 6144)):
        w_bytes = 3 * d * i / 2**20
        assert fused_layer_shapes_ok(d, i, 128, 128), (d, i)
        x = jnp.asarray(rng.standard_normal((256, d)) * 0.5, jnp.bfloat16)
        nw = jnp.asarray(rng.standard_normal(d) * 0.1 + 1.0, jnp.bfloat16)
        wg = _quant_weight(jnp.asarray(rng.standard_normal((d, i)) * 0.02, jnp.bfloat16))
        wu = _quant_weight(jnp.asarray(rng.standard_normal((d, i)) * 0.02, jnp.bfloat16))
        wd = _quant_weight(jnp.asarray(rng.standard_normal((i, d)) * 0.02, jnp.bfloat16))
        t0 = time.time()
        out = fused_mlp_int8_layer(x, nw, wg, wu, wd, eps=1e-6)
        out.block_until_ready()
        dt = time.time() - t0
        # op-chain reference: x + _mlp_int8(pre-norm fused) — mirror
        # model.py's composition (layer dict with mlp_norm)
        layer = {"mlp_norm": nw}
        lq = {"w_gate": wg, "w_up": wu, "w_down": wd}
        ref = x + _mlp_int8(layer, lq, x, 1e-6)
        c = _cos(out, ref)
        mx = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(
            f"d={d} i={i} weights={w_bytes:.1f}MB: compile+run {dt:.1f}s, "
            f"cos vs op-chain {c:.6f}, max|diff| {mx:.4f}",
            flush=True,
        )
        assert c > 0.9999, c
    print("exp_fusedlayer_vmem OK")


if __name__ == "__main__":
    main()
