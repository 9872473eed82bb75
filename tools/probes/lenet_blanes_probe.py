#!/usr/bin/env python
"""Batch-on-lanes probe for the DENSE small-channel LeNet convs (r5,
VERDICT r4 task 7).

PROFILE_r04's lenet_headline_analysis proves the 5x5 convs use <= 52 of
128 MXU lanes (~8% of int8 peak). The r3 blanes experiment packed batch
onto lanes for DEPTHWISE and lost 2x; this probe asks the open question
for the dense convs — the analog of the reference's d32 channel padding
(hexagon/ops/src/niti_op_supernode_new.c).

Variants per conv (int32 accumulator only — the requant above is
identical for all):
  conv      XLA conv_general_dilated (the shipping lowering)
  im2col    explicit im2col + (M,K)x(K,N) dot — N = oc on lanes
  groupdiag batch-group block-diagonal GEMM: G batch groups packed into
            the lane axis (N = G*oc ~ 128) against a block-diagonal
            weight — G x the MACs, but the dead lanes were idle anyway
  transpose (N,K)x(K,M) with the huge M = B*OH*OW on the LANE axis and
            oc on the sublane axis

Run on TPU: python tools/probes/lenet_blanes_probe.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

from mandheling_tpu.utils import compile_cache

compile_cache.enable()

LO, HI, ROUNDS = 5, 55, 3


def dev_time(fn):
    @jax.jit
    def run(iters):
        def body(i, carry):
            dep, acc = carry
            y = fn(dep)
            return ((y.ravel()[0] & 1).astype(jnp.int8),
                    acc + jnp.sum(y, dtype=jnp.int32))

        _, acc = jax.lax.fori_loop(
            0, iters, body, (jnp.zeros((), jnp.int8), jnp.int32(0)))
        return acc

    lo, hi = jnp.int32(LO), jnp.int32(HI)
    np.asarray(run(lo)); np.asarray(run(hi))
    deltas = []
    for _ in range(ROUNDS):
        t0 = time.perf_counter(); np.asarray(run(lo))
        t1 = time.perf_counter(); np.asarray(run(hi))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / (HI - LO))
    return float(np.median(deltas))


def im2col(x, kh, kw):
    b, h, w, c = x.shape
    oh, ow = h - kh + 1, w - kw + 1
    cols = [x[:, dy:dy + oh, dx:dx + ow, :]
            for dy in range(kh) for dx in range(kw)]
    return jnp.concatenate(cols, axis=-1).reshape(b * oh * ow, kh * kw * c)


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("conv1 5x5 1->20 @28x28 b2048", (2048, 28, 28, 1), (5, 5), 20, 6),
        ("conv2 5x5 20->52 @12x12 b2048", (2048, 12, 12, 20), (5, 5), 52, 2),
    ]
    results = []
    for name, xshape, (kh, kw), oc, groups in cases:
        b, h, w_, ic = xshape
        oh, ow = h - kh + 1, w_ - kw + 1
        k = kh * kw * ic
        x = jnp.asarray(rng.integers(-30, 30, xshape).astype(np.int8))
        w = jnp.asarray(rng.integers(-30, 30, (kh, kw, ic, oc)).astype(np.int8))
        w2 = w.reshape(k, oc)
        # block-diagonal weight (G*K, G*oc): group g uses block (g,g)
        wbd = np.zeros((groups * k, groups * oc), np.int8)
        for g in range(groups):
            wbd[g * k:(g + 1) * k, g * oc:(g + 1) * oc] = np.asarray(w2)
        wbd = jnp.asarray(wbd)

        def v_conv(d, x=x, w=w):
            return jax.lax.conv_general_dilated(
                x + d, w, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)

        def v_im2col(d, x=x, w2=w2, kh=kh, kw=kw):
            a = im2col(x + d, kh, kw)
            return jax.lax.dot_general(
                a, w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def v_groupdiag(d, x=x, wbd=wbd, kh=kh, kw=kw, G=groups,
                        b=b, oh=oh, ow=ow, oc=oc, k=k):
            a = im2col(x + d, kh, kw)               # (B*OH*OW, K)
            m = a.shape[0]
            a = a.reshape(G, m // G, k).transpose(1, 0, 2).reshape(
                m // G, G * k)                       # (M/G, G*K)
            out = jax.lax.dot_general(
                a, wbd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)    # (M/G, G*oc)
            return out.reshape(m // G, G, oc).transpose(1, 0, 2)

        def v_transpose(d, x=x, w2=w2, kh=kh, kw=kw):
            a = im2col(x + d, kh, kw)                # (M, K)
            return jax.lax.dot_general(
                w2.T, a.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)    # (oc, M)

        for vname, fn in (("conv", v_conv), ("im2col", v_im2col),
                          ("groupdiag", v_groupdiag),
                          ("transpose", v_transpose)):
            try:
                ms = dev_time(fn) * 1e3
                row = {"op": f"{name} {vname}", "ms": round(ms, 4)}
            except Exception as e:
                row = {"op": f"{name} {vname}", "error": str(e)[:120]}
            results.append(row)
            print(json.dumps(row), flush=True)
    out = os.environ.get("OUT", "/tmp/lenet_blanes_probe.json")
    with open(out, "w") as f:
        json.dump({"probe": "lenet dense batch-on-lanes (r5)",
                   "rows": results}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
