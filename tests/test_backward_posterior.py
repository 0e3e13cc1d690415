"""Backward pass + posterior decoding tests.

Root of trust: the Forward total (itself validated against brute-force
path enumeration in test_p7.py) — the Backward total must equal it from
the other direction; posteriors are validated against a brute-force
path-weighted enumeration on the mini profile.
"""

import math

import numpy as np
import pytest

from hmm_fasta_viterbi_tpu import parse_hmm, parse_hmm_text
from hmm_fasta_viterbi_tpu.io.alphabet import encode_sequence
from hmm_fasta_viterbi_tpu.models.msv import length_transitions
from hmm_fasta_viterbi_tpu.models.p7 import P7Profile
from hmm_fasta_viterbi_tpu.ops.reference import (
    backward_oracle,
    forward_oracle,
    posterior_match,
)

from test_hmm_parsing import MINI_HMM

TOL = 2e-3


@pytest.fixture(scope="module")
def mini_p7():
    return P7Profile.from_profile(parse_hmm_text(MINI_HMM))


@pytest.fixture(scope="module")
def p7_100(profile_dir):
    return P7Profile.from_profile(parse_hmm(profile_dir / "100.hmm"))


@pytest.mark.parametrize("L", [1, 3, 17, 64])
def test_forward_backward_totals_agree(p7_100, L):
    rng = np.random.default_rng(L)
    tokens = rng.integers(0, 20, size=L).astype(np.int32)
    f = float(forward_oracle(p7_100, tokens))
    b = float(backward_oracle(p7_100, tokens))
    assert f == pytest.approx(b, abs=TOL)


def brute_force_match_posteriors(p7: P7Profile, tokens: np.ndarray):
    """Path-weighted enumeration: accumulate, per (position, match
    state), the probability mass of paths emitting that token from that
    state. Mirrors test_p7.brute_force_paths with usage recording."""
    seq_len = len(tokens)
    mr = p7.num_states
    tr_loop, tr_move = (float(x) for x in length_transitions(seq_len))
    msc = p7.msc.astype(np.float64)
    isc = p7.isc.astype(np.float64)
    entries: list[tuple[float, tuple]] = []  # (score, match-usage cells)

    def from_core(j, state, pos, acc, used):
        if state in ("M", "D"):
            after_e(pos, acc, used)
        if state == "M":
            if pos < seq_len and j + 1 < mr:
                from_core(j + 1, "M", pos + 1,
                          acc + float(p7.tmm[j]) + msc[tokens[pos], j + 1],
                          used + ((pos, j + 1),))
            if pos < seq_len:
                from_core(j, "I", pos + 1,
                          acc + float(p7.tmi[j]) + isc[tokens[pos], j], used)
            if j + 1 < mr:
                from_core(j + 1, "D", pos, acc + float(p7.tmd[j]), used)
        elif state == "I":
            if pos < seq_len and j + 1 < mr:
                from_core(j + 1, "M", pos + 1,
                          acc + float(p7.tim[j]) + msc[tokens[pos], j + 1],
                          used + ((pos, j + 1),))
            if pos < seq_len:
                from_core(j, "I", pos + 1,
                          acc + float(p7.tii[j]) + isc[tokens[pos], j], used)
        elif state == "D":
            if pos < seq_len and j + 1 < mr:
                from_core(j + 1, "M", pos + 1,
                          acc + float(p7.tdm[j]) + msc[tokens[pos], j + 1],
                          used + ((pos, j + 1),))
            if j + 1 < mr:
                from_core(j + 1, "D", pos, acc + float(p7.tdd[j]), used)

    def after_e(pos, acc, used):
        if pos <= seq_len:
            entries.append(
                (acc + float(p7.tr_E_C) + (seq_len - pos) * tr_loop + tr_move, used)
            )
        for j_loops in range(seq_len - pos + 1):
            begin_segment(pos + j_loops,
                          acc + float(p7.tr_E_J) + j_loops * tr_loop + tr_move,
                          used)

    def begin_segment(pos, acc, used):
        if pos >= seq_len:
            return
        for j in range(mr):
            from_core(j, "M", pos + 1,
                      acc + float(p7.tr_B_Mk) + msc[tokens[pos], j],
                      used + ((pos, j),))

    for n_loops in range(seq_len + 1):
        begin_segment(n_loops, n_loops * tr_loop + tr_move, ())

    scores = np.array([s for s, _ in entries], dtype=np.float64)
    m = scores.max()
    total = m + math.log(np.exp(scores - m).sum())
    post = np.zeros((seq_len, mr), dtype=np.float64)
    for s, used in entries:
        w = math.exp(s - total)
        for pos, j in used:
            post[pos, j] += w
    return post, total


@pytest.mark.parametrize("seq", ["AC", "CAY", "ACDE"])
def test_posterior_match_vs_brute_force(mini_p7, seq):
    tokens = encode_sequence(seq)
    want, total_bf = brute_force_match_posteriors(mini_p7, tokens)
    got, total = posterior_match(mini_p7, tokens)
    assert float(total) == pytest.approx(total_bf, abs=TOL)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=0)


def test_posterior_rows_are_probabilities(p7_100):
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 20, size=48).astype(np.int32)
    post, total = posterior_match(p7_100, tokens)
    assert math.isfinite(float(total))
    assert np.all(post >= 0)
    # each position is emitted by at most one match state
    assert np.all(post.sum(axis=1) <= 1.0 + 1e-3)


def test_cli_search_domains(tmp_path, profile_dir, capsys):
    """--domains reports a posterior envelope for forced hits."""
    from hmm_fasta_viterbi_tpu.cli import main

    # a sequence the profile should actually hit would need a real match;
    # force the cascade open with huge p-value thresholds via config? The
    # CLI has fixed thresholds, so instead synthesize a high-scoring
    # sequence: emit the profile's own consensus (argmax match emissions).
    import numpy as np

    from hmm_fasta_viterbi_tpu import parse_hmm
    from hmm_fasta_viterbi_tpu.io.alphabet import AMINO_ACIDS

    hmm = parse_hmm(profile_dir / "100.hmm")
    cons = np.argmax(hmm.match_emissions[1:], axis=1)
    seq = "".join(AMINO_ACIDS[a] for a in cons)
    fasta = tmp_path / "hit.fsa"
    fasta.write_text(f">consensus\n{seq}\n>junk\nACDEFGHIKLMNPQRSTVWY\n")

    rc = main(
        [
            "scan",
            "--stage", "search",
            "--domains",
            "--backend", "xla",
            "--hmm", str(profile_dir / "100.hmm"),
            "--fasta", str(fasta),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "env_from" in out
    hit_lines = [l for l in out.splitlines() if l.startswith("consensus")]
    assert hit_lines, out
    fields = hit_lines[0].split("\t")
    env_from, env_to, ndom = int(fields[-4]), int(fields[-3]), int(fields[-2])
    # the consensus should be covered nearly end to end, as one domain
    assert env_from <= 5 and env_to >= len(seq) - 5, (env_from, env_to)
    assert ndom == 1

    # two consensus copies joined by junk must decode as TWO domains
    fasta2 = tmp_path / "hit2.fsa"
    junk = "ACDEFGHIKLMNPQRSTVWY" * 3
    fasta2.write_text(f">double\n{seq}{junk}{seq}\n")
    rc = main(
        [
            "scan",
            "--stage", "search",
            "--domains",
            "--backend", "xla",
            "--hmm", str(profile_dir / "100.hmm"),
            "--fasta", str(fasta2),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("double")]
    assert lines, out  # the doubled consensus must still be a hit
    f2 = lines[0].split("\t")
    assert f2[-2] and f2[-2] != "0", lines[0]  # envelope must decode
    assert int(f2[-2]) >= 2, lines[0]  # multihit: at least two segments
    # round 3: per-domain envelope-rescored Forward scores reported
    doms = [d for d in f2[-1].split(";") if d]
    assert len(doms) == int(f2[-2]), lines[0]
    for d in doms:
        span, score = d.split(":")
        assert float(score) > 0, lines[0]  # each copy is a strong match

    # JSON rows: per-domain bits + i-Evalue (envelope-rescored Forward
    # through the exp-tail calibration x true database size)
    import json as _json
    import math

    from hmm_fasta_viterbi_tpu.models import stats as _stats

    rc = main(
        [
            "scan", "--stage", "search", "--domains", "--backend", "xla",
            "--format", "json",
            "--hmm", str(profile_dir / "100.hmm"),
            "--fasta", str(fasta2),
        ]
    )
    assert rc == 0
    rows = _json.loads(capsys.readouterr().out)
    hit = next(r for r in rows if r["target"] == "double")
    assert len(hit["domains"]) == hit["ndom"] >= 2
    for d in hit["domains"]:
        assert d["score_bits"] == pytest.approx(
            d["score_nats"] / math.log(2), abs=2e-4
        )
        want_p = float(
            _stats.forward_pvalue(np.float64(d["score_nats"]), hmm)
        )
        assert d["ievalue"] == pytest.approx(want_p * 1, rel=1e-2)


def test_backward_xla_batched_matches_forward(p7_100):
    """Batched device backward: beta_0(N) == forward, ragged + empty."""
    from hmm_fasta_viterbi_tpu.ops.p7_scan import backward_xla, forward_xla

    rng = np.random.default_rng(9)
    lengths = np.array([48, 100, 7, 1, 0, 64], dtype=np.int32)
    tokens = rng.integers(0, 20, size=(len(lengths), 100)).astype(np.int32)
    f = np.asarray(forward_xla(p7_100, tokens, lengths))
    b = np.asarray(backward_xla(p7_100, tokens, lengths))
    mask = lengths > 0
    np.testing.assert_allclose(b[mask], f[mask], atol=TOL, rtol=0)
    assert np.isneginf(b[~mask]).all()


def test_backward_xla_vs_oracle(mini_p7):
    from hmm_fasta_viterbi_tpu.ops.p7_scan import backward_xla

    rng = np.random.default_rng(10)
    lengths = np.array([5, 12, 2], dtype=np.int32)
    tokens = rng.integers(0, 20, size=(3, 12)).astype(np.int32)
    got = np.asarray(backward_xla(mini_p7, tokens, lengths))
    want = np.array(
        [backward_oracle(mini_p7, tokens[i, : lengths[i]]) for i in range(3)]
    )
    np.testing.assert_allclose(got, want, atol=TOL, rtol=0)


def test_posterior_match_xla_vs_oracle(p7_100):
    from hmm_fasta_viterbi_tpu.ops.p7_scan import posterior_match_xla

    rng = np.random.default_rng(11)
    tokens = rng.integers(0, 20, size=40).astype(np.int32)
    want, wt = posterior_match(p7_100, tokens)
    got, gt = posterior_match_xla(p7_100, tokens)
    assert float(gt) == pytest.approx(float(wt), abs=TOL)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=0)


def test_posterior_coverage_batch_vs_single(p7_100):
    """Batched vmapped coverage (one device call per chunk) must match
    the per-sequence posterior decode, ragged lengths + chunk padding
    included (VERDICT r1 #4)."""
    from hmm_fasta_viterbi_tpu.ops.p7_scan import (
        posterior_coverage_batch_xla,
        posterior_match_xla,
    )

    rng = np.random.default_rng(13)
    lengths = np.array([40, 7, 33, 40, 18], dtype=np.int32)
    tokens = rng.integers(0, 20, size=(5, 40)).astype(np.int32)
    cov, totals = posterior_coverage_batch_xla(
        p7_100, tokens, lengths, chunk=2  # forces a padded last chunk
    )
    for b in range(5):
        post, total = posterior_match_xla(p7_100, tokens[b, : lengths[b]])
        assert float(totals[b]) == pytest.approx(float(total), abs=TOL)
        np.testing.assert_allclose(
            cov[b, : lengths[b]],
            np.asarray(post).sum(axis=1),
            atol=1e-4, rtol=0,
        )
        assert np.all(cov[b, lengths[b] :] == 0.0)


def test_posterior_coverage_pallas_vs_xla(p7_100):
    """Two-pass Pallas forward-backward decode (interpret) must match
    the lax.scan coverage path on a ragged batch, totals included."""
    from hmm_fasta_viterbi_tpu.ops.p7_scan import posterior_coverage_batch_xla
    from hmm_fasta_viterbi_tpu.ops.pallas_posterior import (
        posterior_coverage_batch_pallas,
    )

    rng = np.random.default_rng(17)
    lengths = np.array([40, 7, 33, 40, 18], dtype=np.int32)
    tokens = rng.integers(0, 20, size=(5, 40)).astype(np.int32)
    want_cov, want_tot = posterior_coverage_batch_xla(p7_100, tokens, lengths)
    got_cov, got_tot = posterior_coverage_batch_pallas(
        p7_100, tokens, lengths, interpret=True
    )
    np.testing.assert_allclose(got_tot, want_tot, atol=2e-3, rtol=0)
    n = min(got_cov.shape[1], want_cov.shape[1])
    # 4e-3: round 3 streams the alpha rows in bf16 (ops.pallas_posterior
    # docstring); the envelope consumer thresholds at 0.5, >100x this
    np.testing.assert_allclose(
        got_cov[:, :n], want_cov[:, :n], atol=4e-3, rtol=0
    )
    for b in range(5):
        assert np.all(got_cov[b, lengths[b]:] == 0.0)


def test_posterior_coverage_pallas_mini_multidomain():
    """Two consensus copies joined by junk must keep two covered
    segments through the Pallas decode (multihit path via J)."""
    from hmm_fasta_viterbi_tpu.ops.p7_scan import posterior_coverage_batch_xla
    from hmm_fasta_viterbi_tpu.ops.pallas_posterior import (
        posterior_coverage_batch_pallas,
    )

    p7 = P7Profile.from_profile(parse_hmm_text(MINI_HMM))
    rng = np.random.default_rng(23)
    tokens = rng.integers(0, 20, size=(3, 64)).astype(np.int32)
    lengths = np.array([64, 5, 31], dtype=np.int32)
    want_cov, want_tot = posterior_coverage_batch_xla(p7, tokens, lengths)
    got_cov, got_tot = posterior_coverage_batch_pallas(
        p7, tokens, lengths, interpret=True
    )
    np.testing.assert_allclose(got_tot, want_tot, atol=2e-3, rtol=0)
    n = min(got_cov.shape[1], want_cov.shape[1])
    # 4e-3: bf16 alpha stream (see above)
    np.testing.assert_allclose(got_cov[:, :n], want_cov[:, :n], atol=4e-3, rtol=0)


def test_cli_search_domains_pallas_backend(tmp_path, profile_dir, capsys):
    """--domains through the pallas backend exercises the two-pass
    Pallas posterior kernel (interpret on CPU) end to end via the CLI."""
    from hmm_fasta_viterbi_tpu.cli import main
    from hmm_fasta_viterbi_tpu import parse_hmm
    from hmm_fasta_viterbi_tpu.io.alphabet import AMINO_ACIDS

    hmm = parse_hmm(profile_dir / "100.hmm")
    cons = np.argmax(hmm.match_emissions[1:], axis=1)
    seq = "".join(AMINO_ACIDS[a] for a in cons)
    fasta = tmp_path / "hit.fsa"
    fasta.write_text(f">consensus\n{seq}\n>junk\nACDEFGHIKLMNPQRSTVWY\n")

    rc = main(
        [
            "scan", "--stage", "search", "--domains",
            "--backend", "pallas",
            "--hmm", str(profile_dir / "100.hmm"),
            "--fasta", str(fasta),
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    hit_lines = [l for l in out.splitlines() if l.startswith("consensus")]
    assert hit_lines, out
    fields = hit_lines[0].split("\t")
    env_from, env_to, ndom = int(fields[-4]), int(fields[-3]), int(fields[-2])
    assert env_from <= 5 and env_to >= len(seq) - 5, (env_from, env_to)
    assert ndom == 1


def test_posterior_coverage_pallas_multi_lane_block():
    """batch_chunk > 128 pads to multiple 128-lane blocks; the profile
    scalars must reach every block (they ride SMEM — a lane-row packing
    only reached block 0, zeroing B->Mk for rows 128+ and NaN-ing their
    coverage)."""
    from hmm_fasta_viterbi_tpu.ops.p7_scan import posterior_coverage_batch_xla
    from hmm_fasta_viterbi_tpu.ops.pallas_posterior import (
        posterior_coverage_batch_pallas,
    )

    p7 = P7Profile.from_profile(parse_hmm_text(MINI_HMM))
    rng = np.random.default_rng(41)
    b = 140  # > 128: second lane block
    tokens = rng.integers(0, 20, size=(b, 24)).astype(np.int32)
    lengths = np.full(b, 24, dtype=np.int32)
    lengths[135] = 5
    got_cov, got_tot = posterior_coverage_batch_pallas(
        p7, tokens, lengths, interpret=True, batch_chunk=256
    )
    assert np.isfinite(got_tot).all(), got_tot
    want_cov, want_tot = posterior_coverage_batch_xla(
        p7, tokens[130:], lengths[130:]
    )
    np.testing.assert_allclose(got_tot[130:], want_tot, atol=2e-3, rtol=0)
    n = min(got_cov.shape[1], want_cov.shape[1])
    np.testing.assert_allclose(
        got_cov[130:, :n], want_cov[:, :n], atol=2e-3, rtol=0
    )


def test_multidomain_envelope_vs_oracle(profile_dir):
    """Round 3 (VERDICT #7): constructed 2-repeat consensus sequences
    must decode as ndom=2 with envelope spans matching an oracle
    envelope computed from ops.reference.posterior_match."""
    from conftest import consensus_tokens
    from hmm_fasta_viterbi_tpu import parse_hmm
    from hmm_fasta_viterbi_tpu.cli import _coverage_segments, _domain_scores
    from hmm_fasta_viterbi_tpu.models.p7 import P7Profile
    from hmm_fasta_viterbi_tpu.ops.p7_scan import posterior_coverage_batch_xla
    from hmm_fasta_viterbi_tpu.ops.reference import posterior_match

    hmm = parse_hmm(profile_dir / "100.hmm")
    p7 = P7Profile.from_profile(hmm)
    core = 100  # LENG of 100.hmm
    spacer = 60
    toks = consensus_tokens(hmm, repeats=2, spacer=spacer, seed=3)
    L = len(toks)
    assert L == 2 * core + spacer

    post, _total = posterior_match(p7, toks)
    segs_oracle = _coverage_segments(post.sum(axis=1), L)
    assert len(segs_oracle) == 2, segs_oracle

    cov, _ = posterior_coverage_batch_xla(p7, toks[None], np.array([L]))
    segs = _coverage_segments(cov[0], L)
    assert segs == segs_oracle, (segs, segs_oracle)

    # each envelope covers ~one consensus copy
    (f1, t1), (f2, t2) = segs
    assert f1 <= 5 and abs(t1 - core) <= 5, segs
    assert abs(f2 - (core + spacer + 1)) <= 5 and t2 >= L - 5, segs

    # per-domain envelope rescoring: two strong, comparable scores
    scores = _domain_scores(
        p7, toks[None], np.array([L]), {0: segs}, backend="xla"
    )
    s0, s1 = scores[(0, 0)], scores[(0, 1)]
    assert s0 > 0 and s1 > 0
    assert abs(s0 - s1) < 0.1 * max(abs(s0), abs(s1)) + 1.0


def test_posterior_mask_threshold_matches_host(p7_100):
    """mask_threshold=0.5 must equal thresholding the f32 coverage on
    the host (the --domains envelope extractor's only read), including
    the xla-fallback path."""
    from hmm_fasta_viterbi_tpu.ops.pallas_posterior import (
        posterior_coverage_batch_pallas,
    )

    rng = np.random.default_rng(11)
    tokens = rng.integers(0, 20, size=(4, 96)).astype(np.int32)
    lengths = np.array([96, 1, 57, 96], dtype=np.int32)
    cov, tot = posterior_coverage_batch_pallas(
        p7_100, tokens, lengths, interpret=True
    )
    mask, tot2 = posterior_coverage_batch_pallas(
        p7_100, tokens, lengths, interpret=True, mask_threshold=0.5
    )
    assert mask.dtype == np.uint8
    np.testing.assert_array_equal(mask, (cov >= 0.5).astype(np.uint8))
    np.testing.assert_array_equal(tot, tot2)
