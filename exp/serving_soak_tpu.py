"""Concurrent serving soak on the real chip: production decoder + full trie.

Drives the live demo server (tools/demo_server.py) with the shipped
FT0-trained decoder (assets/bench_ft0_decoder.npz, 42,919-noun vocabulary)
at the product gencfg (guided beam k=10 over the full trie), measuring
sequential vs 8-client-concurrent request throughput — the number that
shows what request coalescing (MicroBatcher) buys on real hardware.

The embedder is the checkpoint's hash test embedder (host-side), so the
measured path is: HTTP -> PIL decode -> embed -> padded guided-beam decode
on the TPU (with this dev environment's ~30 ms axon-tunnel dispatch
latency per inference batch, which a local TPU host would not pay).

Run ON TPU: python exp/serving_soak_tpu.py
"""

import io
import json
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GENCFG = "beam_k10_vnone_gp_t1_a0"
MAX_BATCH = 8
N_CLIENTS, PER_CLIENT = 8, 12
SEQUENTIAL = 16


def http_post(port, path, body):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    try:
        conn.request("POST", path, body=body)
        resp = conn.getresponse()
        return resp.status, resp.read()
    finally:
        conn.close()


def main():
    from novic_tpu.infer import NOVICModel
    from novic_tpu.tools.demo_server import create_server

    import PIL.Image

    rng = np.random.default_rng(0)
    pngs = []
    for i in range(4):
        buf = io.BytesIO()
        PIL.Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
                            ).save(buf, format="PNG")
        pngs.append(buf.getvalue())

    model = NOVICModel(os.path.join(REPO, "assets", "bench_ft0_decoder.npz"),
                       gencfg=GENCFG, batch_size=MAX_BATCH)
    with model:
        server = create_server(model, port=0, max_batch=MAX_BATCH)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        st = server.RequestHandlerClass.state
        print(f"serving {GENCFG} over W={len(model.task.guide_targets)} guide "
              f"targets, max_batch={MAX_BATCH}")

        # Warm (compile the padded shape + build/upload the trie)
        t0 = time.perf_counter()
        status, body = http_post(port, "/classify", pngs[0])
        assert status == 200, body
        print(f"warm-up request (compile + trie): {time.perf_counter() - t0:.1f} s")

        # Sequential baseline
        t0 = time.perf_counter()
        for i in range(SEQUENTIAL):
            status, body = http_post(port, "/classify", pngs[i % len(pngs)])
            assert status == 200, body
        seq_rate = SEQUENTIAL / (time.perf_counter() - t0)
        print(f"sequential: {seq_rate:.1f} req/s "
              f"({1000.0 / seq_rate:.1f} ms/request incl. tunnel dispatch)")

        # Concurrent soak
        before_b, before_r = st.batcher.batches_run, st.batcher.requests_served

        def client(cid):
            r = np.random.default_rng(cid)
            for _ in range(PER_CLIENT):
                status, body = http_post(port, "/classify",
                                         pngs[int(r.integers(len(pngs)))])
                assert status == 200, body
                out = json.loads(body)
                assert out["gencfg"] == GENCFG

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=N_CLIENTS) as pool:
            list(pool.map(client, range(N_CLIENTS)))
        wall = time.perf_counter() - t0
        total = N_CLIENTS * PER_CLIENT
        conc_rate = total / wall
        batches = st.batcher.batches_run - before_b
        print(f"concurrent ({N_CLIENTS} clients): {conc_rate:.1f} req/s — "
              f"{total} requests in {batches} inference batches "
              f"(mean group {total / max(batches, 1):.1f}, "
              f"largest {st.batcher.max_group})")
        print(f"coalescing gain: {conc_rate / seq_rate:.2f}x over sequential")

        server.shutdown()
        thread.join(timeout=10)


if __name__ == "__main__":
    main()
