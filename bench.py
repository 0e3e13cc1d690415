#!/usr/bin/env python
"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: GCUPS scanning the reference's flagship workload — the
1400-state profile (algorithms/benchmark_MSV_1400.cpp) against 3500-aa
random sequences — batched for TPU. ``--sweep`` adds the 24-profile sweep
(algorithms/benchmark_MSV.cpp equivalent). ``--quick`` shrinks the batch
for smoke runs.

vs_baseline uses BASELINE.md's derived anchor (the reference publishes no
numbers): 1 GCUPS == one 14.7 ms reference benchmark pass.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from hmm_fasta_viterbi_tpu import MSVProfile, parse_hmm  # noqa: E402
from hmm_fasta_viterbi_tpu.bench.harness import (  # noqa: E402
    bench_profile,
    emit_json_line,
    random_tokens,
)


def get_scan(impl: str):
    if impl in ("auto", "pallas"):
        try:
            from hmm_fasta_viterbi_tpu.ops.pallas_msv import msv_pallas

            return msv_pallas, "pallas"
        except Exception as e:  # pragma: no cover - fallback path
            if impl == "pallas":
                raise
            print(f"# pallas unavailable ({e}); falling back to xla", file=sys.stderr)
    from hmm_fasta_viterbi_tpu.ops.xla_scan import msv_xla

    return msv_xla, "xla"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="auto", choices=["auto", "pallas", "xla"])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seq-len", type=int, default=3500)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true", help="small batch smoke run")
    ap.add_argument("--sweep", action="store_true", help="also run the 24-profile sweep")
    args = ap.parse_args()

    if args.quick:
        args.batch = min(args.batch, 32)
        args.reps = 2

    scan, impl_name = get_scan(args.impl)
    print(f"# impl={impl_name} batch={args.batch} L={args.seq_len}", file=sys.stderr)

    profile_dir = REPO / "data" / "profile_HMMs"
    tokens, lengths = random_tokens(args.batch, args.seq_len, seed=0)

    headline_profile = MSVProfile.from_profile(parse_hmm(profile_dir / "1400.hmm"))
    primary = bench_profile(
        f"headline_1400_{impl_name}", headline_profile, scan, tokens, lengths, args.reps
    )
    print(f"# headline: {primary.gcups:.2f} GCUPS ({primary.seconds*1e3:.1f} ms)", file=sys.stderr)

    extras = []
    if args.sweep:
        for path in sorted(profile_dir.glob("*.hmm"), key=lambda p: int(p.stem)):
            prof = MSVProfile.from_profile(parse_hmm(path))
            res = bench_profile(f"sweep_{path.stem}_{impl_name}", prof, scan, tokens, lengths, 2)
            extras.append(res)
            print(f"# sweep {path.stem}: {res.gcups:.2f} GCUPS", file=sys.stderr)

    # exact reference workload (3 x 3500 aa) for the record
    ref_tokens, ref_lengths = random_tokens(3, 3500, seed=0)
    extras.append(
        bench_profile(f"ref_1400_b3_{impl_name}", headline_profile, scan, ref_tokens, ref_lengths, args.reps)
    )

    np_scores = np.asarray(scan(headline_profile, tokens[:2], lengths[:2]))
    assert np.all(np.isfinite(np_scores)), "benchmark scan produced non-finite scores"

    print(emit_json_line(primary, extras))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
