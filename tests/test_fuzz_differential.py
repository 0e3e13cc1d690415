"""Randomized differential fuzzing: synthetic profiles (beyond the 24
checked-in Pfam files) through every device path vs the NumPy oracles.

Profiles are drawn with adversarial emission ranges (near-zero
probabilities -> scores approaching the clamp, spiky distributions) and
transition rows that exercise the delete chain hard.
"""

import numpy as np
import pytest

from hmm_fasta_viterbi_tpu.io.hmmio import ProfileHMM
from hmm_fasta_viterbi_tpu.models.msv import MSVProfile
from hmm_fasta_viterbi_tpu.models.p7 import P7Profile
from hmm_fasta_viterbi_tpu.ops.pallas_msv import msv_pallas
from hmm_fasta_viterbi_tpu.ops.pallas_p7 import forward_pallas, viterbi_pallas
from hmm_fasta_viterbi_tpu.ops.reference import (
    forward_oracle_batch,
    msv_oracle_batch,
    viterbi_oracle_batch,
)


def random_profile(rng: np.random.Generator, leng: int) -> ProfileHMM:
    m = leng + 1
    # spiky Dirichlet-ish emissions with occasional near-zero entries
    me = rng.dirichlet(np.full(20, 0.2), size=m).astype(np.float32)
    me[0] = 0.0  # dummy M0 row
    ie = rng.dirichlet(np.full(20, 1.0), size=m).astype(np.float32)
    # transitions: random but normalized-ish triples; some heavy deletes
    tr = rng.dirichlet(np.full(7, 0.5), size=m).astype(np.float32)
    # push a few nodes toward delete-heavy behavior (big tdd)
    heavy = rng.integers(0, m, size=max(1, m // 4))
    tr[heavy, 6] = 0.95
    return ProfileHMM(
        name=f"fuzz{leng}",
        model_length=m,
        match_emissions=me,
        insert_emissions=ie,
        transitions=tr,
        stats_local_msv_mu=-5.0,
        stats_local_msv_lambda=0.7,
        stats_local_viterbi_mu=-6.0,
        stats_local_viterbi_lambda=0.7,
        stats_local_forward_theta=-2.0,
        stats_local_forward_lambda=0.7,
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_msv_pallas(seed):
    rng = np.random.default_rng(100 + seed)
    leng = int(rng.integers(3, 60))
    hmm = random_profile(rng, leng)
    profile = MSVProfile.from_profile(hmm)
    lengths = rng.integers(0, 96, size=6).astype(np.int32)
    tokens = rng.integers(0, 20, size=(6, 96)).astype(np.int32)
    want = msv_oracle_batch(profile, tokens, lengths)
    got = np.asarray(msv_pallas(profile, tokens, lengths, interpret=True))
    finite = np.isfinite(want)
    np.testing.assert_allclose(got[finite], want[finite], atol=1e-4, rtol=0)
    assert np.all(np.isneginf(got[~finite]))


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_p7_pallas(seed):
    rng = np.random.default_rng(200 + seed)
    leng = int(rng.integers(3, 40))
    hmm = random_profile(rng, leng)
    p7 = P7Profile.from_profile(hmm)
    lengths = np.array([48, 1, 31, 64], dtype=np.int32)
    tokens = rng.integers(0, 20, size=(4, 64)).astype(np.int32)

    want_v = viterbi_oracle_batch(p7, tokens, lengths)
    got_v = np.asarray(viterbi_pallas(p7, tokens, lengths, interpret=True))
    np.testing.assert_allclose(got_v, want_v, atol=1e-4, rtol=0)

    want_f = forward_oracle_batch(p7, tokens, lengths)
    got_f = np.asarray(
        forward_pallas(p7, tokens, lengths, interpret=True, prob_space=True)
    )
    np.testing.assert_allclose(got_f, want_f, atol=2e-3, rtol=0)


def test_fuzz_parsers_raise_cleanly():
    """Mutated inputs must either parse or raise the STRUCTURED parse
    errors — never IndexError/KeyError/UnboundLocal crashes (the
    reference's parsers crash on such inputs — SURVEY.md quirk 5)."""
    from hmm_fasta_viterbi_tpu.io.fastaio import FastaParseError, parse_fasta_text
    from hmm_fasta_viterbi_tpu.io.hmmio import HMMParseError, parse_hmm_text
    from test_hmm_parsing import MINI_HMM

    rng = np.random.default_rng(7)
    lines = MINI_HMM.splitlines()
    for trial in range(60):
        mutated = list(lines)
        op = trial % 3
        if op == 0:  # truncate
            mutated = mutated[: int(rng.integers(0, len(lines)))]
        elif op == 1:  # drop a random line
            del mutated[int(rng.integers(0, len(mutated)))]
        else:  # corrupt a random line
            i = int(rng.integers(0, len(mutated)))
            mutated[i] = "".join(
                rng.choice(list("abc* .-123\t")) for _ in range(20)
            )
        try:
            parse_hmm_text("\n".join(mutated))
        except HMMParseError:
            pass  # the contract

    fasta_bases = [">a\nACDE\n", "ACDE\n", ">\n\n>", ">x", "", "\n\n", ">y\nZZ@#\n"]
    for trial in range(40):
        base = fasta_bases[trial % len(fasta_bases)]
        chars = list(base)
        if chars:
            i = int(rng.integers(0, len(chars)))
            chars[i] = chr(int(rng.integers(32, 127)))
        try:
            parse_fasta_text("".join(chars))
        except FastaParseError:
            pass  # the contract


def test_prob_forward_pad_overflow_regression():
    """Regression (found by TPU fuzz): with a real-residue pad token, a
    finished lane's unmasked prob-space M row compounds that residue's
    emission odds once per padded step — hundreds of pad steps overflow
    f32 and poison log_scale to inf. The out-of-alphabet PAD_TOKEN makes
    pad steps the emission identity."""
    from hmm_fasta_viterbi_tpu.pipeline import MSVScanner

    rng = np.random.default_rng(99)
    # profile whose token-0 ('A') odds are large at every state
    me = np.full((41, 20), 0.01 / 19, dtype=np.float32)
    me[:, 0] = 0.99
    me[0] = 0.0
    ie = rng.dirichlet(np.full(20, 1.0), size=41).astype(np.float32)
    tr = rng.dirichlet(np.full(7, 1.0), size=41).astype(np.float32)
    hmm = ProfileHMM(
        name="padfuzz", model_length=41, match_emissions=me,
        insert_emissions=ie, transitions=tr,
        stats_local_msv_mu=-5.0, stats_local_msv_lambda=0.7,
        stats_local_viterbi_mu=-6.0, stats_local_viterbi_lambda=0.7,
        stats_local_forward_theta=-2.0, stats_local_forward_lambda=0.7,
    )
    p7 = P7Profile.from_profile(hmm)
    # short lengths + a big l_chunk -> hundreds of padded steps
    sc = MSVScanner(backend="pallas", interpret=True, l_chunk=256)
    lengths = np.array([10, 9, 12, 15, 4, 2], dtype=np.int32)
    tokens = rng.integers(0, 20, size=(6, 17)).astype(np.int32)
    staged = sc.stage(tokens, lengths)
    got = np.asarray(sc.scan_p7(p7, staged, stage="forward"))
    assert np.all(np.isfinite(got)), got
    want = forward_oracle_batch(p7, tokens, lengths)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=0)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_viterbi_filter_bound(seed):
    """Upper-bound invariant of the Viterbi prefilter under random
    profiles (random transition structure stresses the truncated-chain
    tail term and the per-profile auto window)."""
    from hmm_fasta_viterbi_tpu.ops.pallas_p7 import viterbi_filter_pallas

    rng = np.random.default_rng(300 + seed)
    leng = int(rng.integers(3, 40))
    hmm = random_profile(rng, leng)
    p7 = P7Profile.from_profile(hmm)
    lengths = np.array([48, 1, 31, 64], dtype=np.int32)
    tokens = rng.integers(0, 20, size=(4, 64)).astype(np.int32)
    exact = viterbi_oracle_batch(p7, tokens, lengths)
    filt = np.asarray(
        viterbi_filter_pallas(p7, tokens, lengths, interpret=True)
    )
    assert np.all(filt >= exact - 1e-6), (filt - exact).min()


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_posterior_coverage_pallas(seed):
    """Two-pass Pallas posterior decode vs the lax.scan coverage on
    random profiles."""
    from hmm_fasta_viterbi_tpu.ops.p7_scan import posterior_coverage_batch_xla
    from hmm_fasta_viterbi_tpu.ops.pallas_posterior import (
        posterior_coverage_batch_pallas,
    )

    rng = np.random.default_rng(400 + seed)
    leng = int(rng.integers(3, 30))
    hmm = random_profile(rng, leng)
    p7 = P7Profile.from_profile(hmm)
    lengths = np.array([40, 3, 25], dtype=np.int32)
    tokens = rng.integers(0, 20, size=(3, 40)).astype(np.int32)
    want_cov, want_tot = posterior_coverage_batch_xla(p7, tokens, lengths)
    got_cov, got_tot = posterior_coverage_batch_pallas(
        p7, tokens, lengths, interpret=True
    )
    np.testing.assert_allclose(got_tot, want_tot, atol=2e-3, rtol=0)
    n = min(got_cov.shape[1], want_cov.shape[1])
    np.testing.assert_allclose(
        got_cov[:, :n], want_cov[:, :n], atol=2e-3, rtol=0
    )
