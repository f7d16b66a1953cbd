"""Serving tour: the live demo server with the production serving features.

Builds a toy checkpoint (examples/quickstart.py), then runs the HTTP demo
server (tools/demo_server.py — the TPU-native analogue of the reference's
hosted Spaces demo) and exercises what production serving relies on:

  1. per-request generation configs (?gencfg=..., cached compiled tasks),
  2. concurrent-request micro-batching (same-gencfg requests coalesce into
     one padded inference batch under the model lock),
  3. the on-disk 'all'-mode precompute store (restart-cheap serving:
     the second model start reuses the persisted artifact).

Run:  python examples/serving.py
"""

import json
import os
import sys
import tempfile
import threading
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from quickstart import NOUNS, build_demo_checkpoint  # noqa: E402 (examples dir on path)

from novic_tpu.infer import NOVICModel
from novic_tpu.tools.demo_server import create_server


def http_get(port, path, body=None, method=None):
    import http.client

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    try:
        conn.request(method or ("POST" if body is not None else "GET"), path, body=body)
        resp = conn.getresponse()
        return resp.status, resp.read()
    finally:
        conn.close()


def main():
    workdir = tempfile.mkdtemp(prefix="novic_serving_")
    print(f"Workdir: {workdir}")
    ckpt, base = build_demo_checkpoint(workdir)
    store = os.path.join(workdir, "precompute")

    # A PNG to classify: the test embedder hash-embeds arbitrary pixels, so
    # any image works; production uses real photos + a CLIP backbone.
    import PIL.Image

    img_path = os.path.join(workdir, "sample.png")
    PIL.Image.fromarray(np.random.default_rng(0).integers(
        0, 256, (32, 32, 3), dtype=np.uint8)).save(img_path)

    model = NOVICModel(ckpt, gencfg="beam_k3_vnone_gn_t1_a0", batch_size=8,
                       precompute_dir=store)
    with model:
        server = create_server(model, image_dir=workdir, port=0, max_batch=8)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        print(f"Serving on http://127.0.0.1:{port}/")

        # 1. Per-request gencfgs: same upload, three decode strategies
        png = open(img_path, "rb").read()
        for gencfg in ("greedy_k1_vnone_gn_t1_a0", "beam_k3_vnone_gn_t1_a0",
                       "all_k3_vnone_gr_t1_a0"):
            status, body = http_get(port, f"/classify?gencfg={gencfg}", body=png)
            out = json.loads(body)
            print(f"  {gencfg:26s} -> {out['preds'][0][0]!r} "
                  f"({out['ms']:.1f} ms, group of {out['batched']})")

        # 2. Concurrency: 8 clients fire at once; followers coalesce into the
        #    leader's padded batch instead of queueing one-by-one
        def one(_):
            status, body = http_get(port, "/classify", body=png)
            return json.loads(body)["batched"]

        st = server.RequestHandlerClass.state
        before = st.batcher.batches_run
        with ThreadPoolExecutor(max_workers=8) as pool:
            groups = list(pool.map(one, range(8)))
        print(f"  8 concurrent requests ran as {st.batcher.batches_run - before} "
              f"batches (largest group {st.batcher.max_group}); "
              f"per-request group sizes {groups}")

        server.shutdown()
        thread.join(timeout=10)

    # 3. Restart-cheap serving: the 'all'-mode precompute persisted to disk,
    #    so a fresh model start loads it instead of recomputing
    files = os.listdir(store)
    print(f"Precompute store: {files}")
    with NOVICModel(ckpt, gencfg="all_k3_vnone_gr_t1_a0", batch_size=8,
                    precompute_dir=store) as model2:
        out = model2.classify_embeds(base[:2])
    print(f"Restarted model served 'all' decode from the store: "
          f"{[p[0] for p in out.preds]}")


if __name__ == "__main__":
    main()
