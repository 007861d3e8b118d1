"""Train DBNet on synthetic text-block segmentation for the benchmark.

bench.py must run the REAL `OAROCR.predict` path end to end (VERDICT r2
item 2), which needs a detector that actually finds the synthetic text
regions — random init detects nothing, so recognition would run on an
empty pool. This script fits the exact PP-OCRv5-mobile DB topology
(models/detection/db.py — same conv graph the reference's checkpoint
drives, db.rs:94-281) to the DB label convention on synthetic pages:
white background, dark rectangles, target = rectangles shrunk by
d = A·(1−r²)/L with r=0.4 (the standard DB shrink used to produce the
training shrink map the deploy model emits).

The resulting weights are a benchmark FIXTURE, not a converted
checkpoint: identical compute graph, realistic candidate counts; text
content recognized from them is meaningless (rec stays random —
recognition throughput is shape-bound).

Run (real TPU, ~2-4 min incl. remote compile):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/train_bench_det.py
Writes assets/bench_det.safetensors (f16, ~9 MB).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from oar_ocr_tpu.core.constants import IMAGENET_MEAN, IMAGENET_STD
from oar_ocr_tpu.models.detection.db import DBNet
from oar_ocr_tpu.runtime.weights import save_params

H = W = 320
BATCH = 8
STEPS = 400
ASSET = "assets/bench_det.safetensors"


def synth_batch(rng, n=BATCH):
    """Pages of dark text-line bars on white, + DB shrink masks."""
    imgs = np.full((n, H, W, 3), 255, np.uint8)
    masks = np.zeros((n, H, W), np.float32)
    for i in range(n):
        y = int(rng.integers(4, 20))
        while y < H - 40:
            h = int(rng.integers(12, 34))
            w = int(rng.integers(50, 280))
            x = int(rng.integers(2, max(W - w - 2, 3)))
            shade = int(rng.integers(0, 90))
            imgs[i, y : y + h, x : x + w] = shade
            d = max(int(round(0.42 * h * w / (h + w))), 1)  # r=0.4 shrink
            masks[i, y + d : y + h - d, x + d : x + w - d] = 1.0
            y += h + int(rng.integers(8, 30))
    return imgs, masks


def normalize(imgs_u8):
    x = imgs_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def main():
    model = DBNet()
    rng = np.random.default_rng(0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3), jnp.float32))
    params = variables["params"]
    frozen = {k: v for k, v in variables.items() if k != "params"}

    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, imgs_u8, masks):
        def loss_fn(p):
            prob = model.apply({"params": p, **frozen}, normalize(imgs_u8))
            prob = jnp.clip(prob.astype(jnp.float32), 1e-6, 1 - 1e-6)
            bce = -(3.0 * masks * jnp.log(prob)
                    + (1.0 - masks) * jnp.log(1.0 - prob))
            return jnp.mean(bce)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for step in range(STEPS):
        imgs, masks = synth_batch(rng)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(imgs), jnp.asarray(masks))
        if step % 50 == 0 or step == STEPS - 1:
            print(f"step {step:4d} loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", file=sys.stderr)

    out = {"params": jax.device_get(params), **frozen}
    out = jax.tree.map(lambda a: np.asarray(a, np.float16), out)
    save_params(out, ASSET)
    print(f"saved {ASSET}")

    # --- sanity: the full detector finds the bench-style regions ---
    from oar_ocr_tpu.models.detection.detector import DBDetector
    from oar_ocr_tpu.runtime.runtime import stack_padded, Runtime

    det = DBDetector(jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                                  out))
    page = np.full((1280, 960, 3), 255, np.uint8)
    n_expect = 0
    for r in range(20):
        ww, hh = [(700, 28), (420, 26), (180, 24), (760, 34), (260, 22)][r % 5]
        page[40 + r * 60 : 40 + r * 60 + hh, 60 : 60 + ww] = 30
        n_expect += 1
    rtc = Runtime.default().cfg
    pages = Runtime.default().put(stack_padded(
        [page], (rtc.det_side_buckets.bucket(1280),
                 rtc.det_side_buckets.bucket(960))))
    boxes, scores = det.detect(pages, [(1280, 960)])[0]
    print(f"sanity: {len(boxes)}/{n_expect} regions, "
          f"score range {min(scores or [0]):.2f}-{max(scores or [0]):.2f}")


if __name__ == "__main__":
    main()
