#!/usr/bin/env python
"""Round 5 of the 'all'-scoring bisection: attention formulations for extend.

After the redesign (101 s full-W, commit feaddec) the prefix-cached extend
body still dominates; its VPU broadcast-reduce attention is ALU-bound (the
reduce over hd costs hd VPU ops per score vs the MXU's free systolic
accumulation). Candidate: head-packed block-diagonal attention — merge
(T,H) into the matmul M/N dims so scores come from ONE per-row batched
matmul (A instances of (T*H, hd)@(hd, Sk*H), 8x fatter than per-head) with
cross-head entries masked to -inf before softmax; mathematically identical.

Measures (fori marginals, rows=5120-row extend shapes):
  1. VPU broadcast-reduce attention (current extend formulation)
  2. head-packed block-diag attention (two-piece: token + prefix matmuls)
  3. per-head einsum (bqhd,bkhd->bhqk reference point)

Usage: PYTHONPATH=.:/root/.axon_site python exp/all_bisect5.py
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

A = int(os.environ.get("A", 5120))      # chunk*B rows
T = int(os.environ.get("T", 8))         # token positions
P = 4
H, HD = 8, 64
BB = int(os.environ.get("BB", 512))     # base batch (prefix rows)
L = 6
N1, N2 = 2, 10
NEG_INF = -1e30


def marginal(label, loop_fn, *args):
    f1 = jax.jit(functools.partial(loop_fn, N1))
    f2 = jax.jit(functools.partial(loop_fn, N2))
    np.asarray(f1(*args)), np.asarray(f2(*args))
    ts = []
    for f in (f1, f2):
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(f(*args))
        ts.append((time.perf_counter() - t0) / 3)
    dt = (ts[1] - ts[0]) / (N2 - N1) * 1000
    print(f"{label:58s} {dt:9.2f} ms/iter")
    return dt


def main():
    rng = np.random.default_rng(0)
    R = A // BB
    q = jax.device_put(np.asarray(rng.standard_normal((A, T, H, HD)), np.float32))
    k = jax.device_put(np.asarray(rng.standard_normal((A, T, H, HD)), np.float32))
    v = jax.device_put(np.asarray(rng.standard_normal((A, T, H, HD)), np.float32))
    pk = jax.device_put(np.asarray(rng.standard_normal((BB, P, H, HD)), np.float32))
    pv = jax.device_put(np.asarray(rng.standard_normal((BB, P, H, HD)), np.float32))
    token_bias = jnp.where(jnp.arange(T)[None, :] <= jnp.arange(T)[:, None], 0.0, NEG_INF)
    print(f"A={A} T={T} P={P} H={H} hd={HD} BB={BB} R={R}")

    def attn_vpu(q, k, v):
        st = (q[:, :, None, :, :] * k[:, None, :, :, :]).sum(axis=-1)  # (A,T,T,H)
        st = st + token_bias[:, :, None]
        qb = q.reshape(BB, R, T, H, HD)
        sp = (qb[:, :, :, None, :, :] * pk[:, None, None, :, :, :]).sum(axis=-1)
        scores = jnp.concatenate([sp.reshape(A, T, P, H), st], axis=2)
        attn = jax.nn.softmax(scores, axis=2)
        ap = attn[:, :, :P, :].reshape(BB, R, T, P, H)
        out_p = (ap[..., None] * pv[:, None, None, :, :, :]).sum(axis=3)
        out_t = (attn[:, :, P:, :, None] * v[:, None, :, :, :]).sum(axis=2)
        return out_p.reshape(A, T, H * HD) + out_t.reshape(A, T, H * HD)

    def loop(fn):
        def run(n, q, k, v):
            def one(i, acc):
                return acc + fn(q + i * 1e-9, k, v).sum()
            return jax.lax.fori_loop(0, n, one, jnp.float32(0))
        return run

    marginal(f"extend attention x1 (VPU broadcast-reduce)", loop(attn_vpu), q, k, v)

    # Head-packed block-diagonal: one batched matmul per piece, cross-head
    # entries masked -inf pre-softmax (zero post-softmax => exact).
    h_q = jax.lax.broadcasted_iota(jnp.int32, (T * H, 1), 0) % H
    h_kt = jax.lax.broadcasted_iota(jnp.int32, (1, T * H), 1) % H
    h_kp = jax.lax.broadcasted_iota(jnp.int32, (1, P * H), 1) % H
    t_q = jax.lax.broadcasted_iota(jnp.int32, (T * H, 1), 0) // H
    t_k = jax.lax.broadcasted_iota(jnp.int32, (1, T * H), 1) // H
    mask_t = jnp.where((h_q == h_kt) & (t_k <= t_q), 0.0, NEG_INF)  # (T*H, T*H)
    mask_p = jnp.where(h_q == h_kp, 0.0, NEG_INF)                   # (T*H, P*H)

    def attn_packed(q, k, v):
        q2 = q.reshape(A, T * H, HD)
        k2 = k.reshape(A, T * H, HD)
        v2 = v.reshape(A, T * H, HD)
        st = jnp.einsum("amd,and->amn", q2, k2, preferred_element_type=jnp.float32)
        st = st + mask_t
        qb = q2.reshape(BB, R * T * H, HD)
        pk2 = pk.reshape(BB, P * H, HD)
        sp = jnp.einsum("bmd,bnd->bmn", qb, pk2, preferred_element_type=jnp.float32)
        sp = sp.reshape(A, T * H, P * H) + mask_p
        scores = jnp.concatenate([sp, st], axis=2)  # (A, T*H, (P+T)*H)
        attn = jax.nn.softmax(scores, axis=2)
        ap = attn[:, :, : P * H].reshape(BB, R * T * H, P * H)
        pv2 = pv.reshape(BB, P * H, HD)
        out_p = jnp.einsum("bmn,bnd->bmd", ap, pv2,
                           preferred_element_type=jnp.float32).reshape(A, T * H, HD)
        out_t = jnp.einsum("amn,and->amd", attn[:, :, P * H :], v2,
                           preferred_element_type=jnp.float32)
        return (out_p + out_t).reshape(A, T, H * HD)

    marginal(f"extend attention x1 (head-packed block-diag)", loop(attn_packed), q, k, v)

    # Exactness check (CPU-free: compare on device, small tolerance)
    d = jnp.abs(attn_vpu(q, k, v) - attn_packed(q, k, v)).max()
    print(f"max |vpu - packed| = {np.asarray(d):.2e}")

    def attn_einsum(q, k, v):
        st = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        st = st + token_bias
        qb = q.reshape(BB, R, T, H, HD)
        sp = jnp.einsum("brqhd,bphd->brhqp", qb, pk,
                        preferred_element_type=jnp.float32).reshape(A, H, T, P)
        scores = jnp.concatenate([sp, st], axis=3)  # (A,H,T,P+T)
        attn = jax.nn.softmax(scores, axis=3)
        ap = attn[:, :, :, :P].reshape(BB, R, H, T, P)
        out_p = jnp.einsum("brhqp,bphd->brqhd", ap, pv,
                           preferred_element_type=jnp.float32).reshape(A, T, H, HD)
        out_t = jnp.einsum("bhqk,bkhd->bqhd", attn[:, :, :, P:], v,
                           preferred_element_type=jnp.float32)
        return (out_p + out_t).reshape(A, T, H * HD)

    marginal(f"extend attention x1 (per-head einsum)", loop(attn_einsum), q, k, v)


if __name__ == "__main__":
    main()
