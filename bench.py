"""Benchmark: GeM-R50 descriptor extraction throughput (images/sec/chip).

Runs on the default JAX platform (the real TPU under the driver).  Prints
ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.  Baseline is the
driver target of 2000 images/sec/chip (BASELINE.json).

Timing uses the chained-dependency slope method (utils.benchtime): on this
rig block_until_ready acks asynchronously through the remote tunnel, so
naive timing measures dispatch latency, not execution.
"""

import json

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 2000.0


def main():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from research_image_retrieval_tpu.models import get_model
    from research_image_retrieval_tpu.utils.benchtime import timed_slope

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

    sec_per_step = timed_slope(extract, images, n_small=3, n_large=13)
    imgs_per_sec = batch / sec_per_step
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
