#!/usr/bin/env python
"""Measure the delete-chain per-pass cost on hardware (round 3).

Times the exact Viterbi kernel and the filter kernel at a sweep of
chain windows (filter_window = number of Hillis-Steele passes kept).
The filter differs from exact only in the 1-term vs 3-term emission
select (measured free — MXU-hidden) and the chain depth, so the slope
of time-vs-window isolates the marginal cost of one chain pass, and the
intercept bounds the non-chain step cost. This decides the round-3
exact-Viterbi design (lazy certificate vs two-level scan vs flat chain).

Also sweeps lane width (via pick_lanes widest) and l_chunk.

Run on TPU: python tools/chain_lab.py [--batch 2048] [--m 1400]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hmm_fasta_viterbi_tpu import parse_hmm  # noqa: E402
from hmm_fasta_viterbi_tpu.models.p7 import P7Profile  # noqa: E402
from hmm_fasta_viterbi_tpu.ops import pallas_p7 as pp  # noqa: E402
from hmm_fasta_viterbi_tpu.ops import pallas_msv as pm  # noqa: E402


def timeit(fn, reps=3):
    np.asarray(fn())  # warm/compile
    best = float("inf")
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        dt = time.perf_counter() - t0
        out.append(dt)
        best = min(best, dt)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--seq-len", type=int, default=3500)
    ap.add_argument("--m", default="1400")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--widest", type=int, default=512)
    ap.add_argument("--l-chunk", type=int, default=pp.DEFAULT_L_CHUNK)
    ap.add_argument("--windows", default="1,2,3,4,5,6,8,11")
    ap.add_argument("--lazy", default="", help="lazy_k values to time, e.g. 5,6,7")
    ap.add_argument("--group-cert", action="store_true",
                    help="lazy kernel: amortize the certificate over "
                    "each unroll group (round 4)")
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--unroll", type=int, default=0,
                    help="force the step unroll (0 = pick_p7_unroll)")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret mode (offline smoke only; "
                    "forces jax_platforms=cpu)")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    print(f"# devices: {jax.devices()}", flush=True)
    hmm = parse_hmm(REPO / "data" / "profile_HMMs" / f"{args.m}.hmm")
    p7 = P7Profile.from_profile(hmm)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 20, size=(args.batch, args.seq_len)).astype(np.int32)
    lengths = np.full(args.batch, args.seq_len, dtype=np.int32)
    cells = int(lengths.astype(np.int64).sum()) * (p7.model_length - 1)

    # stage once
    tokens_t, lengths_p, tr_rows, b, l_chunk = pp._prepare_tokens(
        tokens, lengths, args.l_chunk
    )
    tokens_d = jnp.asarray(tokens_t)
    lengths_d = jnp.asarray(lengths_p)
    tr_rows_d = jnp.asarray(tr_rows)

    if args.unroll:
        pp.pick_p7_unroll = lambda m_pad, l_chunk, base: args.unroll

    # lane-width override
    orig_pick = pm.pick_lanes
    if args.widest != 512:
        pp.pick_lanes = lambda b_pad, m_pad, widest, m_cap: orig_pick(
            b_pad, m_pad, args.widest, 4096 if args.widest > 512 else m_cap
        )

    msc_t, isc_t, trans_t, chain_t, tr_consts = pp.prepare_p7_device(p7)
    exact_args = tuple(
        jnp.asarray(x) for x in (msc_t, isc_t, trans_t, chain_t)
    ) + (tokens_d, lengths_d, tr_rows_d, jnp.asarray(tr_consts))

    if not args.skip_exact:
        pp._p7_pallas_padded.clear_cache()
        try:
            best, out = timeit(
                lambda: pp._p7_pallas_padded(
                    *exact_args, l_chunk=l_chunk, interpret=args.interpret,
                    forward=False, e_skip_d=pp.e_skip_d_ok(p7),
                ),
                args.reps,
            )
            print(
                f"exact        widest={args.widest} l_chunk={l_chunk}: "
                f"{cells/best/1e9:7.2f} GCUPS  {best*1e3:8.2f} ms  reps={[f'{x*1e3:.1f}' for x in out]}",
                flush=True,
            )
        except Exception as e:  # one rejected config must not kill the lab
            print(f"exact: FAILED {type(e).__name__}: {e}", flush=True)

    for k in [int(x) for x in args.lazy.split(",") if x]:
        msc_t2, isc_t2, trans_t2, chain_t2, consts5, kk = (
            pp.prepare_p7_device_lazy(p7, lazy_k=k)
        )
        pp._p7_pallas_padded.clear_cache()
        try:
            best, out = timeit(
                lambda: pp._p7_pallas_padded(
                    jnp.asarray(msc_t2), jnp.asarray(isc_t2),
                    jnp.asarray(trans_t2), jnp.asarray(chain_t2),
                    tokens_d, lengths_d, tr_rows_d, jnp.asarray(consts5),
                    l_chunk=l_chunk, interpret=args.interpret, forward=False,
                    e_skip_d=True, lazy_k=kk, group_cert=args.group_cert,
                ),
                args.reps,
            )
        except Exception as e:
            print(f"lazy  K={kk}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        gc = " gcert" if args.group_cert else ""
        print(
            f"lazy  K={kk:2d}{gc} widest={args.widest} l_chunk={l_chunk}: "
            f"{cells/best/1e9:7.2f} GCUPS  {best*1e3:8.2f} ms  reps={[f'{x*1e3:.1f}' for x in out]}",
            flush=True,
        )

    window_points = []  # (n_passes, best_seconds) for the roofline fit
    for w in [int(x) for x in args.windows.split(",") if x]:
        packed = pp.prepare_p7_device_filter(p7, window_log2=w)
        msc_bf, isc_bf, ftrans, fchain, ftr_consts, window, e_skip = packed
        pp._p7_filter_padded.clear_cache()
        try:
            best, out = timeit(
                lambda: pp._p7_filter_padded(
                    jnp.asarray(msc_bf), jnp.asarray(isc_bf), jnp.asarray(ftrans),
                    jnp.asarray(fchain), tokens_d, lengths_d, tr_rows_d,
                    jnp.asarray(ftr_consts), l_chunk=l_chunk, interpret=args.interpret,
                    filter_window=window, e_skip_d=e_skip,
                ),
                args.reps,
            )
        except Exception as e:
            print(f"filter w={window}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(
            f"filter w={window:2d} widest={args.widest} l_chunk={l_chunk}: "
            f"{cells/best/1e9:7.2f} GCUPS  {best*1e3:8.2f} ms  reps={[f'{x*1e3:.1f}' for x in out]}",
            flush=True,
        )
        window_points.append((window, best))

    if len(window_points) >= 2:
        # Least-squares fit t(w) = intercept + slope*w over the filter
        # window sweep: the slope is the marginal cost of one chain
        # pass, the intercept the chain-free step cost. The implied
        # ceilings are what PERFORMANCE.md's roofline argument needs —
        # computed here, at measurement time, from the same run.
        ws = np.array([p[0] for p in window_points], dtype=np.float64)
        ts = np.array([p[1] for p in window_points], dtype=np.float64)
        slope, intercept = np.polyfit(ws, ts, 1)
        m_pad = pp._round_up(max(p7.num_states, 8), 8)
        n_passes = max(1, int(np.ceil(np.log2(max(m_pad, 2)))))
        print(
            f"# roofline fit: pass cost {slope*1e3:.2f} ms, chain-free "
            f"intercept {intercept*1e3:.1f} ms ({cells/intercept/1e9:.1f} GCUPS)",
            flush=True,
        )
        for k in (0, 2, 3, 5, n_passes):
            t = intercept + slope * k
            print(
                f"# roofline: {k:2d} passes -> {cells/t/1e9:6.1f} GCUPS ceiling",
                flush=True,
            )

    pp.pick_lanes = orig_pick


if __name__ == "__main__":
    main()
