"""Filter-cascade (MSV -> Viterbi -> Forward) tests.

A consensus sequence (per-node argmax match emission) must sail through
all three stages; random sequences must be rejected early.
"""

import numpy as np
import pytest

from hmm_fasta_viterbi_tpu import parse_hmm
from hmm_fasta_viterbi_tpu.cli import main
from hmm_fasta_viterbi_tpu.io.alphabet import AMINO_ACIDS
from hmm_fasta_viterbi_tpu.io.fastaio import FastaRecord, write_fasta
from hmm_fasta_viterbi_tpu.pipeline import MSVScanner, SearchPipeline


def consensus_sequence(hmm) -> str:
    best = np.argmax(hmm.match_emissions[1:], axis=1)
    return "".join(AMINO_ACIDS[i] for i in best)


@pytest.fixture(scope="module")
def hmm100(profile_dir):
    return parse_hmm(profile_dir / "100.hmm")


@pytest.fixture(scope="module")
def mixed_batch(hmm100):
    rng = np.random.default_rng(21)
    cons = consensus_sequence(hmm100)
    from hmm_fasta_viterbi_tpu.io.alphabet import encode_sequence

    cons_tokens = encode_sequence(cons)
    seq_len = max(len(cons), 120)
    tokens = rng.integers(0, 20, size=(5, seq_len)).astype(np.int32)
    lengths = np.full(5, seq_len, dtype=np.int32)
    tokens[2, : len(cons)] = cons_tokens
    lengths[2] = len(cons)
    return tokens, lengths


def test_cascade(hmm100, mixed_batch):
    tokens, lengths = mixed_batch
    scanner = MSVScanner(backend="xla")
    staged = scanner.stage(tokens, lengths)
    result = SearchPipeline(scanner).search(hmm100, staged, tokens, lengths)

    assert result.passed_msv[2]
    assert result.passed_viterbi[2]
    assert result.passed_forward[2]
    assert result.hits.tolist() == [2]
    # random sequences rejected at the first stage
    assert not result.passed_msv[[0, 1, 3, 4]].any()
    # stages only computed for survivors
    assert np.isnan(result.viterbi_scores[0])
    assert np.isfinite(result.viterbi_scores[2])
    # forward dominates viterbi on the survivor
    assert result.forward_scores[2] >= result.viterbi_scores[2]


def test_cli_search_stage(tmp_path, profile_dir, hmm100, capsys):
    cons = consensus_sequence(hmm100)
    fasta = tmp_path / "mix.fsa"
    rng = np.random.default_rng(3)
    rand = "".join(AMINO_ACIDS[i] for i in rng.integers(0, 20, 150))
    write_fasta(fasta, [FastaRecord("rand", rand), FastaRecord("cons", cons)])

    rc = main(
        ["scan", "--hmm", str(profile_dir / "100.hmm"), "--fasta", str(fasta),
         "--stage", "search", "--backend", "xla"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if not l.startswith("#")]
    assert len(lines) == 1  # only the MSV survivor is reported
    assert lines[0].startswith("cons") and lines[0].rstrip().endswith("1")


@pytest.mark.parametrize("stage", ["viterbi", "forward"])
def test_cli_p7_stages(tmp_path, profile_dir, hmm100, stage, capsys):
    cons = consensus_sequence(hmm100)
    fasta = tmp_path / "c.fsa"
    write_fasta(fasta, [FastaRecord("cons", cons)])
    rc = main(
        ["scan", "--hmm", str(profile_dir / "100.hmm"), "--fasta", str(fasta),
         "--stage", stage]
    )
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if not l.startswith("#")]
    assert len(lines) == 1
    score_bits = float(lines[0].split("\t")[3])
    assert score_bits > 50  # consensus scores far above noise


def test_fast_cascade_identical_hits(hmm100, mixed_batch):
    """fast_msv + fast_viterbi (upper-bound prefilters + exact rescore)
    must produce the same hit set and identical exact scores on hits as
    the plain cascade (VERDICT r1 #1 'done' criterion)."""
    tokens, lengths = mixed_batch
    scanner = MSVScanner(backend="pallas", interpret=True, l_chunk=64)
    staged = scanner.stage(tokens, lengths)
    plain = SearchPipeline(scanner).search(hmm100, staged, tokens, lengths)
    fast = SearchPipeline(
        scanner, fast_msv=True, fast_viterbi=True
    ).search(hmm100, staged, tokens, lengths)

    assert fast.hits.tolist() == plain.hits.tolist() == [2]
    np.testing.assert_array_equal(fast.passed_msv, plain.passed_msv)
    np.testing.assert_array_equal(fast.passed_viterbi, plain.passed_viterbi)
    np.testing.assert_array_equal(fast.passed_forward, plain.passed_forward)
    # survivors carry EXACT stage scores in both modes
    for h in fast.hits:
        assert fast.msv_scores[h] == pytest.approx(plain.msv_scores[h], abs=1e-4)
        assert fast.viterbi_scores[h] == pytest.approx(
            plain.viterbi_scores[h], abs=1e-4
        )
        assert fast.forward_scores[h] == pytest.approx(
            plain.forward_scores[h], abs=2e-3
        )


def test_fused_cascade_identical_hits(hmm100, mixed_batch):
    """The one-dispatch fused cascade must reproduce the plain
    pipeline's hit set and stage decisions exactly (device pruning uses
    conservative thresholds; final decisions are host f64)."""
    tokens, lengths = mixed_batch
    scanner = MSVScanner(backend="pallas", interpret=True, l_chunk=64)
    staged = scanner.stage(tokens, lengths)
    plain = SearchPipeline(scanner).search(hmm100, staged, tokens, lengths)
    fused = SearchPipeline(scanner, fused=True).search(
        hmm100, staged, tokens, lengths
    )
    assert fused.hits.tolist() == plain.hits.tolist() == [2]
    np.testing.assert_array_equal(fused.passed_msv, plain.passed_msv)
    np.testing.assert_array_equal(fused.passed_viterbi, plain.passed_viterbi)
    np.testing.assert_array_equal(fused.passed_forward, plain.passed_forward)
    for h in fused.hits:
        assert fused.msv_scores[h] == pytest.approx(plain.msv_scores[h], abs=1e-4)
        assert fused.viterbi_scores[h] == pytest.approx(
            plain.viterbi_scores[h], abs=1e-4
        )
        assert fused.forward_scores[h] == pytest.approx(
            plain.forward_scores[h], abs=2e-3
        )


def test_fused_cascade_overflow_falls_back(hmm100):
    """More survivors than the device capacity: the fused path must
    detect the overflow and fall back to the staged pipeline (never
    silently truncate). 200 consensus copies all pass MSV; cap1 for a
    256-lane batch is 128."""
    cons = consensus_sequence(hmm100)
    from hmm_fasta_viterbi_tpu.io.alphabet import encode_sequence

    ct = encode_sequence(cons)
    tokens = np.tile(ct, (200, 1)).astype(np.int32)
    lengths = np.full(200, len(cons), dtype=np.int32)
    scanner = MSVScanner(backend="pallas", interpret=True, l_chunk=64)
    staged = scanner.stage(tokens, lengths)
    plain = SearchPipeline(scanner).search(hmm100, staged, tokens, lengths)
    fused = SearchPipeline(scanner, fused=True).search(
        hmm100, staged, tokens, lengths
    )
    assert plain.hits.size == 200
    np.testing.assert_array_equal(fused.passed_forward, plain.passed_forward)
    np.testing.assert_array_equal(fused.passed_msv, plain.passed_msv)


def test_fused_cascade_non_identity_compaction(hmm100):
    """Stage-2 compaction holes: lane A passes the device MSV-filter
    threshold but fails the exact rescore (slot ranks shift), and lane
    B passes MSV but FAILS the Viterbi filter — B's recorded
    viterbi-filter score is exactly what the vfilt[cols2] mis-indexing
    bug corrupted (the exact-vit overlay masks the bug for lanes that
    pass). Junk lanes saturate the Gumbel at pv=1.0, so both special
    lanes are weakened consensus variants in the discriminating range."""
    from hmm_fasta_viterbi_tpu.models import stats
    from hmm_fasta_viterbi_tpu.models.msv import MSVProfile as _MSV
    from hmm_fasta_viterbi_tpu.models.p7 import P7Profile
    from hmm_fasta_viterbi_tpu.io.alphabet import encode_sequence

    cons = consensus_sequence(hmm100)
    ct = encode_sequence(cons)
    weak = ct.copy()
    weak[::5] = (weak[::5] + 7) % 20   # hole lane: every 5th mutated
    medium = ct.copy()
    medium[::11] = (medium[::11] + 7) % 20  # MSV-pass, Viterbi-fail lane
    rng = np.random.default_rng(3)
    seq_len = len(cons)
    tokens = rng.integers(0, 20, size=(5, seq_len)).astype(np.int32)
    tokens[1] = weak
    tokens[2] = medium
    tokens[3] = ct
    lengths = np.full(5, seq_len, dtype=np.int32)

    scanner = MSVScanner(backend="pallas", interpret=True, l_chunk=64)
    staged = scanner.stage(tokens, lengths)
    prof = _MSV.from_profile(hmm100)
    filt = np.asarray(scanner.scan_filter(prof, staged))
    exact = np.asarray(scanner.scan(prof, staged))
    assert filt[1] > exact[1] and exact[2] > filt[1] and exact[3] > filt[1]
    thr = (float(exact[1]) + float(filt[1])) / 2
    p_mid = float(stats.msv_pvalue(np.array([thr]), hmm100)[0])
    # viterbi threshold between medium's and consensus's filter scores
    p7 = P7Profile.from_profile(hmm100)
    vf = np.asarray(scanner.scan_p7_filter(p7, staged))
    vit_ex = np.asarray(scanner.scan_p7(p7, staged, stage="viterbi"))
    assert vf[3] > vf[2]
    vthr = (float(max(vf[2], vit_ex[2])) + float(min(vf[3], vit_ex[3]))) / 2
    p_vit = float(stats.viterbi_pvalue(np.array([vthr]), hmm100)[0])
    assert 0.0 < p_mid < 1.0 and 0.0 < p_vit < 1.0

    kw = dict(msv_p=p_mid, viterbi_p=p_vit)
    plain = SearchPipeline(scanner, **kw).search(hmm100, staged, tokens, lengths)
    fused = SearchPipeline(scanner, fused=True, **kw).search(
        hmm100, staged, tokens, lengths
    )
    assert not plain.passed_msv[1]      # the stage-2 hole exists
    assert plain.passed_msv[2] and not plain.passed_viterbi[2]
    assert plain.passed_msv[3] and plain.passed_viterbi[3]
    np.testing.assert_array_equal(fused.passed_msv, plain.passed_msv)
    np.testing.assert_array_equal(fused.passed_viterbi, plain.passed_viterbi)
    np.testing.assert_array_equal(fused.passed_forward, plain.passed_forward)
    # lane 2 is Viterbi-rejected: fused records its OWN viterbi-FILTER
    # score (like the fast path; plain records the exact score — the
    # documented margin-lane semantic difference). The vfilt[cols2] bug
    # gave lane 2 a DIFFERENT lane's score here.
    assert fused.viterbi_scores[2] == pytest.approx(float(vf[2]), abs=1e-4)
    for h in np.flatnonzero(plain.passed_viterbi):
        assert fused.viterbi_scores[h] == pytest.approx(
            plain.viterbi_scores[h], abs=1e-4
        )


def test_fused_overflow_really_overflowed(hmm100, caplog):
    """Companion assert for the fallback test: the overflow branch must
    actually engage (guards against cap resizing silently making the
    test vacuous)."""
    import logging

    cons = consensus_sequence(hmm100)
    from hmm_fasta_viterbi_tpu.io.alphabet import encode_sequence

    ct = encode_sequence(cons)
    tokens = np.tile(ct, (200, 1)).astype(np.int32)
    lengths = np.full(200, len(cons), dtype=np.int32)
    scanner = MSVScanner(backend="pallas", interpret=True, l_chunk=64)
    staged = scanner.stage(tokens, lengths)
    with caplog.at_level(logging.INFO, logger="hmm_fasta_viterbi_tpu.pipeline"):
        SearchPipeline(scanner, fused=True).search(
            hmm100, staged, tokens, lengths
        )
    assert "capacity overflow" in caplog.text


def test_fused_forward_threshold_boundary_contract(hmm100, mixed_batch):
    """Pin the fused-vs-staged Forward boundary semantics (round 3).

    The fused cascade runs Forward at the full-database L_pad while the
    staged path restages survivors at their subset's max length
    (pipeline._fused_cascade docstring), so the two Forward scores agree
    only within the prob-space kernel's rounding (~5e-4 nats; 2e-3 tol).
    Contract pinned here with a constructed threshold-straddler
    (forward_p set exactly AT the survivor's staged p-value):

    (a) common survivors' Forward scores differ < 2e-3 nats;
    (b) each path's hit decision is self-consistent with its OWN score
        vs the shared threshold;
    (c) when the threshold sits outside the divergence band (2x / 0.5x
        the straddling p-value), both paths decide identically — only a
        straddler may flip.
    """
    tokens, lengths = mixed_batch
    scanner = MSVScanner(backend="pallas", interpret=True, l_chunk=64)
    staged = scanner.stage(tokens, lengths)
    kw = dict(msv_p=0.02, viterbi_p=1e-3)

    base = SearchPipeline(scanner, forward_p=1.0, **kw).search(
        hmm100, staged, tokens, lengths
    )
    assert base.passed_forward[2]
    pv = float(base.forward_pvalues[2])
    assert 0 < pv < 1

    for forward_p, may_flip in ((pv, True), (pv * 2, False), (pv * 0.5, False)):
        staged_r = SearchPipeline(scanner, forward_p=forward_p, **kw).search(
            hmm100, staged, tokens, lengths
        )
        fused_r = SearchPipeline(
            scanner, forward_p=forward_p, fused=True, **kw
        ).search(hmm100, staged, tokens, lengths)
        # (a) score agreement on the common survivor
        assert fused_r.forward_scores[2] == pytest.approx(
            staged_r.forward_scores[2], abs=2e-3
        )
        # (b) self-consistency of each path's decision
        for r in (staged_r, fused_r):
            assert bool(r.passed_forward[2]) == bool(
                r.forward_pvalues[2] <= forward_p
            )
        # (c) outside the band the decisions must agree
        if not may_flip:
            np.testing.assert_array_equal(
                fused_r.passed_forward, staged_r.passed_forward
            )


def test_search_caches_bounded_across_batches(hmm100, mixed_batch):
    """Streamed scans call pipeline.search once per FASTA batch with the
    SAME hmm object; the derived MSV/P7 profiles must be memoized so the
    scanner's id-keyed device caches stay bounded (round-3 review: a
    fresh derived profile per batch pinned one profile pack + device
    arrays per batch, an unbounded leak that also re-uploaded the
    profile every batch)."""
    tokens, lengths = mixed_batch
    pipeline = SearchPipeline(MSVScanner(backend="xla"))
    sizes = []
    for _ in range(4):
        staged = pipeline.scanner.stage(tokens, lengths)
        result = pipeline.search(hmm100, staged, tokens, lengths)
        sizes.append(
            (len(pipeline.scanner._profile_cache),
             len(pipeline._derived_cache))
        )
    assert result.passed_forward[2]  # the consensus row still hits
    assert sizes[0] == sizes[-1], sizes  # no growth batch over batch
    assert sizes[-1][1] == 1  # one hmm -> one derived entry


def test_search_bucketed_matches_staged(hmm100, tmp_path, capsys):
    """scan --stage search --bucketed: the bucketed MSV stage feeds the
    same cascade — identical rows to the unbucketed search on a ragged
    database (round 3: --bucketed was msv-only)."""
    import json

    rng = np.random.default_rng(13)
    cons = consensus_sequence(hmm100)
    recs = [FastaRecord(f"r{i}", "".join(
        AMINO_ACIDS[k] for k in rng.integers(0, 20, int(l))
    )) for i, l in enumerate(rng.integers(40, 400, 12))]
    recs.append(FastaRecord("hit", cons))
    fasta = tmp_path / "ragged.fsa"
    write_fasta(fasta, recs)
    from conftest import PROFILE_DIR

    base = ["scan", "--hmm", str(PROFILE_DIR / "100.hmm"),
            "--fasta", str(fasta), "--backend", "xla",
            "--stage", "search", "--format", "json"]
    assert main(base) == 0
    plain = {r["target"]: r for r in json.loads(capsys.readouterr().out)}
    assert main(base + ["--bucketed"]) == 0
    bucketed = {r["target"]: r for r in json.loads(capsys.readouterr().out)}
    assert set(plain) == set(bucketed)
    assert any(r["hit"] for r in bucketed.values())
    for t in plain:
        assert bucketed[t]["msv_bits"] == pytest.approx(
            plain[t]["msv_bits"], abs=1e-4
        )
        assert bucketed[t]["hit"] == plain[t]["hit"]
        assert bucketed[t]["evalue"] == pytest.approx(
            plain[t]["evalue"], rel=1e-6
        )


def test_search_bucketed_fast_prefilter(hmm100, mixed_batch):
    """search_bucketed + fast_msv on the pallas backend: the bf16
    prefilter runs per bucket, exact rescore of candidates — hit set
    identical to the plain staged search."""
    tokens, lengths = mixed_batch
    scanner = MSVScanner(backend="pallas", interpret=True)
    plain = SearchPipeline(scanner).search(
        hmm100, scanner.stage(tokens, lengths), tokens, lengths
    )
    fast = SearchPipeline(scanner, fast_msv=True)
    bucketed = scanner.stage_bucketed(tokens, lengths)
    got = fast.search_bucketed(hmm100, bucketed, tokens, lengths)
    np.testing.assert_array_equal(got.passed_forward, plain.passed_forward)
    np.testing.assert_array_equal(got.passed_msv, plain.passed_msv)
    # exact rescore: survivors' MSV scores match the exact kernel
    surv = np.flatnonzero(got.passed_msv)
    np.testing.assert_allclose(
        got.msv_scores[surv], plain.msv_scores[surv], atol=1e-4
    )
