"""Serving-engine example: request-level micro-batching over OAROCR.

No reference example counterpart — the serving layer is a TPU-native
addition (oar_ocr_tpu/serving/engine.py): independent single-page
requests are coalesced into device-sized batches under a latency
deadline, so a fleet of callers shares one chip at full batch efficiency.
"""

import threading
import time

from _common import load_image, parse_args


def main():
    args = parse_args("Micro-batching serving engine demo",
                      clients=dict(type=int, default=4,
                                   help="concurrent client threads"),
                      requests=dict(type=int, default=4,
                                    help="requests per client"))
    from oar_ocr_tpu.pipelines.ocr import OAROCRBuilder
    from oar_ocr_tpu.serving import ServingConfig, ServingEngine

    img = load_image(args)
    pipe = (OAROCRBuilder("general")
            .with_det_config(box_thresh=0.05, thresh=0.45)   # random-weight
            .build())
    pipe.predict([img])                     # warm the jit caches

    latencies = []
    lock = threading.Lock()

    def client(eng, n):
        for _ in range(n):
            t0 = time.perf_counter()
            res = eng.predict(img, timeout=300)
            with lock:
                latencies.append((time.perf_counter() - t0) * 1e3)
            assert res is not None

    with ServingEngine(pipe, ServingConfig(max_batch_size=8,
                                           max_wait_ms=5)) as eng:
        threads = [threading.Thread(target=client,
                                    args=(eng, args.requests))
                   for _ in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        total = args.clients * args.requests
        print(f"{total} requests from {args.clients} clients in "
              f"{wall*1e3:.0f} ms  ({total/wall:.1f} req/s)")
        print("engine stats:", eng.stats())


if __name__ == "__main__":
    main()
