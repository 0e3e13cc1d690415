"""Command-line interface: the scan tool the reference never finished
(its main.cpp prints "Work in progress" — SURVEY.md component #16).

    python -m hmm_fasta_viterbi_tpu scan  --hmm P.hmm --fasta DB.fsa
    python -m hmm_fasta_viterbi_tpu sweep --hmm-dir profiles/ --fasta DB.fsa
    python -m hmm_fasta_viterbi_tpu generate --out random.fsa --count 3
"""

from __future__ import annotations

import argparse
import json
import logging
import pathlib
import sys
import time

import numpy as np

from .io.loader import load_fasta, load_profile
from .models import stats
from .models.msv import MSVProfile
from .pipeline import MSVScanner

logger = logging.getLogger(__name__)


def _add_common(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--fasta", required=True, help="protein FASTA database")
    ap.add_argument("--backend", default="auto", choices=["auto", "pallas", "xla"])
    ap.add_argument("--format", default="tsv", choices=["tsv", "json"])
    ap.add_argument("--top", type=int, default=0, help="report only the top K hits (0 = all)")
    ap.add_argument("--max-evalue", type=float, default=None, help="E-value cutoff")
    ap.add_argument(
        "--loader",
        default="auto",
        choices=["auto", "native", "python"],
        help="data loader: native C++ fast path or pure-Python parsers",
    )


def _report(profile, db, scores: np.ndarray, args, out=None) -> None:
    out = out if out is not None else sys.stdout
    bits = stats.nats_to_bits(scores)
    pvals = stats.msv_pvalue(scores, profile)
    evals = stats.evalue(pvals, len(db))
    order = np.argsort(-scores)
    if args.top:
        order = order[: args.top]
    rows = []
    for i in order:
        if args.max_evalue is not None and evals[i] > args.max_evalue:
            continue
        rows.append(
            {
                "target": db.records[i].header or f"seq{i}",
                "profile": profile.name,
                "score_nats": round(float(scores[i]), 4),
                "score_bits": round(float(bits[i]), 4),
                "pvalue": float(pvals[i]),
                "evalue": float(evals[i]),
            }
        )
    if args.format == "json":
        json.dump(rows, out, indent=1)
        out.write("\n")
    else:
        out.write("# target\tprofile\tscore_nats\tscore_bits\tpvalue\tevalue\n")
        for r in rows:
            out.write(
                f"{r['target']}\t{r['profile']}\t{r['score_nats']}\t"
                f"{r['score_bits']}\t{r['pvalue']:.3e}\t{r['evalue']:.3e}\n"
            )


def cmd_scan(args) -> int:
    profile = MSVProfile.from_profile(load_profile(args.hmm, prefer=args.loader))
    db = load_fasta(args.fasta, prefer=args.loader)
    if not len(db):
        logger.warning("no valid sequences in %s", args.fasta)
        return 1
    scanner = MSVScanner(backend=args.backend)
    t0 = time.perf_counter()
    staged = scanner.stage_fasta(db)
    scores = np.asarray(scanner.scan(profile, staged))
    dt = time.perf_counter() - t0
    cells = staged.total_residues * (profile.model_length - 1)
    logger.info("scanned %d seqs x %s in %.3fs (%.2f GCUPS)", len(db), profile.name, dt, cells / dt / 1e9)
    _report(profile, db, scores, args)
    return 0


def cmd_sweep(args) -> int:
    paths = sorted(pathlib.Path(args.hmm_dir).glob("*.hmm"))
    if not paths:
        logger.error("no .hmm files in %s", args.hmm_dir)
        return 1
    db = load_fasta(args.fasta, prefer=args.loader)
    scanner = MSVScanner(backend=args.backend)
    staged = scanner.stage_fasta(db)
    for path in paths:
        profile = MSVProfile.from_profile(load_profile(path, prefer=args.loader))
        scores = np.asarray(scanner.scan(profile, staged))
        _report(profile, db, scores, args)
    return 0


def cmd_generate(args) -> int:
    # lazily import: tools/ is not a package
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))
    from generate_fasta import generate_records

    from .io.fastaio import write_fasta

    write_fasta(args.out, generate_records(args.count, args.length, args.seed), args.width)
    print(f"wrote {args.count} x {args.length} aa to {args.out}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="hmm_fasta_viterbi_tpu", description=__doc__)
    ap.add_argument("-v", "--verbose", action="store_true")
    sub = ap.add_subparsers(dest="command", required=True)

    scan = sub.add_parser("scan", help="scan a FASTA database against one profile")
    scan.add_argument("--hmm", required=True, help="HMMER3 .hmm profile")
    _add_common(scan)
    scan.set_defaults(fn=cmd_scan)

    sweep = sub.add_parser("sweep", help="scan a FASTA database against a profile directory")
    sweep.add_argument("--hmm-dir", required=True)
    _add_common(sweep)
    sweep.set_defaults(fn=cmd_sweep)

    gen = sub.add_parser("generate", help="generate a random protein FASTA corpus")
    gen.add_argument("--out", default="random_FASTA.fsa")
    gen.add_argument("--count", type=int, default=3)
    gen.add_argument("--length", type=int, default=3500)
    gen.add_argument("--seed", type=int, default=None)
    gen.add_argument("--width", type=int, default=70)
    gen.set_defaults(fn=cmd_generate)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(levelname)s %(name)s: %(message)s",
        stream=sys.stderr,
    )
    try:
        return args.fn(args)
    except (FileNotFoundError, IsADirectoryError) as e:
        logger.error("%s", e)
        return 2
    except ValueError as e:  # HMMParseError / FastaParseError / bad inputs
        logger.error("%s", e)
        return 2
