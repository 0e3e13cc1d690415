#!/usr/bin/env python
"""Summarize an on-chip campaign's stage logs into one markdown digest.

Reads ``docs/campaign_r04/*.log`` (or a directory given with ``--dir``)
and pulls out the signal lines: perf rows (anything carrying GCUPS/ms),
parity rows (maxerr / drift / VALIDATION), bench JSON lines, and any
failures (tracebacks, Mosaic rejections, VMEM OOMs, FAILED markers).

This exists so the post-campaign analysis is one command instead of an
hour of scrolling: the round-3 campaign produced ~15 stage logs and the
decisions (retune kernel defaults? roofline proof instead of 90 GCUPS?)
hang on a handful of lines buried in them.

Usage:
    python tools/campaign_summary.py [--dir docs/campaign_r04] [--out -]
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

# Lines worth surfacing verbatim, in priority order.
PERF_RE = re.compile(r"GCUPS")
PARITY_RE = re.compile(
    r"maxerr|gap max|drift|VALIDATION|bitwise|certificate|fire"
)
FAIL_RE = re.compile(
    r"FAILED|JaxRuntimeError|Mosaic failed|Ran out of memory|"
    r"Traceback \(most recent call last\)|error: ", re.IGNORECASE
)
# Axon terminal noise that matches FAIL_RE but isn't a stage failure.
NOISE_RE = re.compile(
    r"axon_terminal|axon_host|Logging before InitGoogle|"
    r"libtpu_init_utils|Platform 'axon' is experimental|WARN"
)
JSON_RE = re.compile(r'^\{"metric"')


def classify(path: Path) -> dict:
    perf, parity, bench, fails = [], [], [], []
    try:
        text = path.read_text(errors="replace")
    except OSError as e:
        return {"name": path.stem, "error": str(e)}
    in_traceback = False
    for line in text.splitlines():
        s = line.strip()
        if not s:
            in_traceback = False
            continue
        if JSON_RE.match(s):
            try:
                bench.append(json.loads(s))
            except json.JSONDecodeError:
                fails.append(s[:200])
            continue
        if NOISE_RE.search(s):
            # the actionable compiler error rides inside an axon-terminal
            # log line — pull out just the error clause
            for marker in ("Mosaic failed to compile", "Ran out of memory"):
                idx = s.find(marker)
                if idx >= 0:
                    fails.append(s[idx:idx + 240])
                    break
            continue
        if PERF_RE.search(s):
            perf.append(s)
            continue
        if PARITY_RE.search(s):
            parity.append(s)
            continue
        if FAIL_RE.search(s):
            # keep the first line of a traceback + any error summary line,
            # not the whole frame stack
            if s.startswith(("File ", "^", "~")):
                continue
            if in_traceback and not (
                "Error" in s or "error:" in s or "FAILED" in s
            ):
                continue
            in_traceback = s.startswith("Traceback")
            fails.append(s[:240])
    return {
        "name": path.stem,
        "perf": perf,
        "parity": parity,
        "bench": bench,
        "fails": fails,
    }


def render(stages: list[dict]) -> str:
    out = ["# Campaign digest", ""]
    failed = [s for s in stages if s.get("fails")]
    out.append(
        f"{len(stages)} stage logs; "
        f"{len(failed)} with failure markers "
        f"({', '.join(s['name'] for s in failed) or 'none'})"
    )
    out.append("")
    for s in stages:
        out.append(f"## {s['name']}")
        if s.get("error"):
            out.append(f"(unreadable: {s['error']})")
            out.append("")
            continue
        for line in s["perf"]:
            out.append(f"    {line}")
        for line in s["parity"]:
            out.append(f"    {line}")
        for row in s["bench"]:
            vs = row.get("vs_baseline")
            out.append(
                f"    bench {row.get('metric')}: {row.get('value')} "
                f"{row.get('unit')}"
                + (f" (vs_baseline {vs})" if vs is not None else "")
            )
        if s["fails"]:
            out.append("  failures:")
            for line in s["fails"][:12]:
                out.append(f"    ! {line}")
            if len(s["fails"]) > 12:
                out.append(f"    ! ... {len(s['fails']) - 12} more")
        if not (s["perf"] or s["parity"] or s["bench"] or s["fails"]):
            out.append("    (no signal lines)")
        out.append("")
    return "\n".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="docs/campaign_r04")
    ap.add_argument(
        "--out", default="-",
        help="output file, or - for stdout",
    )
    args = ap.parse_args()
    logs = sorted(
        (p for p in Path(args.dir).glob("*.log")),
        key=lambda p: p.stat().st_mtime,
    )
    text = render([classify(p) for p in logs])
    if args.out == "-":
        print(text)
    else:
        Path(args.out).write_text(text)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
