#!/usr/bin/env python
"""MSV exact/filter kernel timing with per-rep data (round 3, VERDICT #2).

Round 2 recorded filter_1400 = 392.8 GCUPS vs round 1's 435.0 with no
explanation and best-of-N-only artifacts. The kernel did not change
between rounds (git diff a7c83b4..5e503df touches only host staging), so
this lab measures many repetitions of the exact and filter kernels on a
device-staged batch to quantify the tunnel's run-to-run variance and
settle regression-vs-environment.

Run: python tools/msv_lab.py [--batch 16384] [--reps 10]
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

from hmm_fasta_viterbi_tpu import MSVProfile, parse_hmm  # noqa: E402
from hmm_fasta_viterbi_tpu.ops import pallas_msv as pm  # noqa: E402
from hmm_fasta_viterbi_tpu.pipeline import MSVScanner, _round_up  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--seq-len", type=int, default=3500)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument(
        "--sweep", default="",
        help="round-4 filter schedule sweep: comma-separated "
        "widest:unroll:l_chunk triples, e.g. 256:32:256,512:16:256,"
        "1024:8:512 — times the FILTER kernel at each schedule "
        "(production default is 256:32:256)",
    )
    ap.add_argument("--skip-default", action="store_true",
                    help="skip the production exact/filter rows")
    args = ap.parse_args()

    print(f"# devices: {jax.devices()}", flush=True)
    scanner = MSVScanner(backend="pallas")
    b_pad = _round_up(args.batch, pm.LANES)
    l_pad = _round_up(args.seq_len, scanner.l_chunk)
    tok = jax.random.randint(
        jax.random.PRNGKey(0), (l_pad, b_pad), 0, 20, dtype=jnp.int32
    ).astype(jnp.int8)
    lengths = np.zeros(b_pad, dtype=np.int32)
    lengths[: args.batch] = args.seq_len
    if l_pad > args.seq_len:
        tok = tok.at[args.seq_len :].set(pm.PAD_TOKEN)
    if b_pad > args.batch:
        tok = tok.at[:, args.batch :].set(pm.PAD_TOKEN)
    staged = scanner.stage_device(tok, lengths, num_sequences=args.batch)

    profile = MSVProfile.from_profile(
        parse_hmm(REPO / "data" / "profile_HMMs" / "1400.hmm")
    )
    cells = args.batch * args.seq_len * (profile.model_length - 1)

    rows = []
    if not args.skip_default:
        rows += [
            ("exact ", lambda: scanner.scan(profile, staged)),
            ("filter", lambda: scanner.scan_filter(profile, staged)),
        ]
    if args.sweep:
        m_pad = _round_up(profile.num_states + 1, scanner.m_bucket)
        fsc = jnp.asarray(
            pm.prepare_scores_t_filter(profile, m_pad)[None]
        )
        fconsts = jnp.asarray(
            np.array(
                [[profile.tr_B_Mk, profile.tr_E_C, profile.tr_E_J]],
                dtype=np.float32,
            )
        )

        def make_fn(widest, unroll, lc):
            def fn():
                return pm._msv_pallas_padded(
                    fsc, staged.tokens_i8_t, staged.lengths,
                    staged.tr_rows, fconsts, l_chunk=lc, interpret=False,
                    exact=False, skip_row0_guard=True, unroll=unroll,
                    widest=widest,
                )[0]
            return fn

        for spec in args.sweep.split(","):
            widest, unroll, lc = (int(x) for x in spec.split(":"))
            rows.append((f"filter {widest:4d}:{unroll:2d}:{lc:3d}",
                         make_fn(widest, unroll, lc)))

    for name, fn in rows:
        try:
            np.asarray(fn())  # warm/compile
        except Exception as e:  # noqa: BLE001 - a schedule can OOM VMEM
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            reps.append(time.perf_counter() - t0)
        r = np.array(reps)
        print(
            f"{name}: best {cells/r.min()/1e9:7.2f} GCUPS  median "
            f"{cells/np.median(r)/1e9:7.2f}  worst {cells/r.max()/1e9:7.2f}  "
            f"ms={[f'{x*1e3:.1f}' for x in reps]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
