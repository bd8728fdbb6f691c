"""Benchmark: GeM-R50 descriptor extraction throughput (images/sec/chip).

Runs on the default JAX platform (the real TPU under the driver).  Prints
ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.  Baseline is the
driver target of 2000 images/sec/chip (BASELINE.json).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 2000.0


def main():
    from research_image_retrieval_tpu.models import get_model

    model = get_model("gem_r50", num_classes=1024, dtype=jnp.bfloat16)
    batch, size = 64, 224
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, size, size, 3)),
        jnp.bfloat16,
    )
    variables = model.init(
        jax.random.PRNGKey(0), images[:1].astype(jnp.float32),
        labels=jnp.zeros((1,), jnp.int32), train=False,
    )

    @jax.jit
    def extract(x):
        return model.apply(variables, x, method="extract")

    # compile + warmup
    extract(images).block_until_ready()
    t0 = time.perf_counter()
    extract(images).block_until_ready()
    warm = time.perf_counter() - t0

    iters = max(3, int(2.0 / max(warm, 1e-3)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = extract(images)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "gem_r50_extract_imgs_per_sec_224",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
