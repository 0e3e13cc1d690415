"""Pipeline / scanner API tests (staged database, cached profiles)."""

import numpy as np
import pytest

from hmm_fasta_viterbi_tpu import MSVProfile, msv_oracle_batch, parse_fasta, parse_hmm
from hmm_fasta_viterbi_tpu.pipeline import MSVScanner

TOL = 1e-4


@pytest.fixture(scope="module", params=["xla", "pallas"])
def scanner(request):
    if request.param == "pallas":
        return MSVScanner(backend="pallas", interpret=True, l_chunk=64)
    return MSVScanner(backend="xla")


def test_stage_and_scan(scanner, profile_dir, fasta_dir):
    db = parse_fasta(fasta_dir / "fasta_like_example.fsa")
    tokens, lengths = db.encode()
    staged = scanner.stage(tokens, lengths)
    assert staged.num_sequences == 4
    for stem in ("100", "300"):
        profile = MSVProfile.from_profile(parse_hmm(profile_dir / f"{stem}.hmm"))
        got = np.asarray(scanner.scan(profile, staged))
        want = msv_oracle_batch(profile, tokens, lengths)
        np.testing.assert_allclose(got, want, atol=TOL, rtol=0)


def test_scan_many_reuses_staging(scanner, profile_dir, fasta_dir):
    db = parse_fasta(fasta_dir / "fasta_like_example.fsa")
    staged = scanner.stage_fasta(db)
    profiles = [
        MSVProfile.from_profile(parse_hmm(profile_dir / f"{s}.hmm"))
        for s in ("100", "200")
    ]
    results = scanner.scan_many(profiles, staged)
    assert set(results) == {p.name for p in profiles}
    tokens, lengths = db.encode()
    for p in profiles:
        np.testing.assert_allclose(
            results[p.name], msv_oracle_batch(p, tokens, lengths), atol=TOL, rtol=0
        )


def test_profile_cache(scanner, profile_dir, fasta_dir):
    profile = MSVProfile.from_profile(parse_hmm(profile_dir / "100.hmm"))
    staged = scanner.stage_fasta(parse_fasta(fasta_dir / "fasta_like_example.fsa"))
    scanner.scan(profile, staged)
    assert len(scanner._profile_cache) >= 1
    a = np.asarray(scanner.scan(profile, staged))
    b = np.asarray(scanner.scan(profile, staged))
    np.testing.assert_array_equal(a, b)


def test_m_bucketing_parity(profile_dir, fasta_dir):
    """Bucketed M padding must not change scores."""
    db = parse_fasta(fasta_dir / "fasta_like_example.fsa")
    tokens, lengths = db.encode()
    profile = MSVProfile.from_profile(parse_hmm(profile_dir / "100.hmm"))
    want = msv_oracle_batch(profile, tokens, lengths)
    for m_bucket in (8, 256, 1024):
        sc = MSVScanner(backend="pallas", interpret=True, l_chunk=64, m_bucket=m_bucket)
        got = np.asarray(sc.scan(profile, sc.stage(tokens, lengths)))
        np.testing.assert_allclose(got, want, atol=TOL, rtol=0)
