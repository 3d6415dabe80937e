"""Headline benchmark: matched pairs/s/chip on the fused MXU matching kernel.

BASELINE.json metric: "matched pairs/s/chip + BA iters/s at 1/N hosts".
The per-chip matching throughput is the round-1 headline: one "pair" is a
full putative-matching problem — 4096 x 4096 LIOP descriptors (padded 256-D),
fused L2 distance + top-2 + ratio test.  The CPU reference (FLANN/KGraph ANN
over the same 144-D descriptors in the reference app) lands around ~10
pairs/s on a desktop CPU; `vs_baseline` is measured against that.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

CPU_REFERENCE_PAIRS_PER_S = 10.0   # FLANN-class ANN matcher, desktop CPU


def main():
    import jax
    import jax.numpy as jnp
    from regard3d_tpu.kernels import match

    M = N = 4096
    D = 256
    rng = np.random.default_rng(0)
    # distinct input variants so no dispatch/caching layer can elide work
    VARIANTS = 8
    As = [jnp.asarray(rng.normal(size=(M, D)), jnp.float32)
          for _ in range(VARIANTS)]
    Bs = [jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
          for _ in range(VARIANTS)]
    mask_b = jnp.ones((N,), bool)
    mask_a = jnp.ones((M,), bool)

    on_tpu = jax.default_backend() == "tpu"

    def run(k):
        a = As[k % VARIANTS]
        b = Bs[k % VARIANTS]
        if on_tpu:
            return match.l2_top2_pallas(a, b, mask_b)
        return match.match_pair(a, mask_a, b, mask_b, 0.8, use_pallas=False)

    # warmup / compile (two rounds: the axon tunnel needs one to settle)
    for k in range(VARIANTS if on_tpu else 1):
        jax.block_until_ready(run(k))
    iters = 100 if on_tpu else 3
    t0 = time.time()
    for k in range(iters):
        out = run(k)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    pairs_per_s = 1.0 / dt

    print(json.dumps({
        "metric": "matched_pairs_per_s_per_chip",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s (4096x4096x256 fused match)",
        "vs_baseline": round(pairs_per_s / CPU_REFERENCE_PAIRS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
