"""Runtime subsystem tests: config, checkpoint/resume, profiling."""

import json

import numpy as np
import pytest

from hmm_fasta_viterbi_tpu import MSVProfile, msv_oracle_batch, parse_hmm
from hmm_fasta_viterbi_tpu.pipeline import MSVScanner
from hmm_fasta_viterbi_tpu.runtime.checkpoint import ScanCheckpoint, resumable_sweep
from hmm_fasta_viterbi_tpu.runtime.config import EngineConfig
from hmm_fasta_viterbi_tpu.runtime.profiling import SectionTimer


def test_config_roundtrip(tmp_path):
    cfg = EngineConfig(backend="xla", l_chunk=128, mesh_db=4, mesh_sp=2)
    path = tmp_path / "cfg.json"
    cfg.to_json(path)
    again = EngineConfig.from_json(path)
    assert again == cfg


def test_config_rejects_unknown(tmp_path):
    path = tmp_path / "bad.json"
    path.write_text(json.dumps({"backend": "xla", "bogus": 1}))
    with pytest.raises(ValueError, match="bogus"):
        EngineConfig.from_json(path)


def test_config_from_env():
    env = {"HFV_BACKEND": "pallas", "HFV_L_CHUNK": "256", "HFV_MESH_DB": "none",
           "HFV_MSV_P": "0.05"}
    cfg = EngineConfig.from_env(env)
    assert cfg.backend == "pallas"
    assert cfg.l_chunk == 256
    assert cfg.mesh_db is None
    assert cfg.msv_p == 0.05


def test_resumable_sweep(tmp_path, profile_dir):
    rng = np.random.default_rng(5)
    tokens = rng.integers(0, 20, size=(10, 64)).astype(np.int32)
    lengths = np.full(10, 64, dtype=np.int32)
    profiles = [
        MSVProfile.from_profile(parse_hmm(profile_dir / s))
        for s in ("100.hmm", "200.hmm")
    ]
    scanner = MSVScanner(backend="xla")
    ckpt = ScanCheckpoint(tmp_path / "ckpt")

    res1 = resumable_sweep(scanner, profiles, tokens, lengths, ckpt, shard_size=4)
    for p in profiles:
        want = msv_oracle_batch(p, tokens, lengths)
        np.testing.assert_allclose(res1[p.name], want, atol=1e-4, rtol=0)

    # resume: all shards cached -> identical results without rescanning
    class Boom:
        def stage(self, *a, **k):
            raise AssertionError("resume must not rescan")

    res2 = resumable_sweep(Boom(), profiles, tokens, lengths, ckpt, shard_size=4)
    for p in profiles:
        np.testing.assert_array_equal(res1[p.name], res2[p.name])


def test_resume_partition_mismatch(tmp_path, profile_dir):
    tokens = np.zeros((4, 8), dtype=np.int32)
    lengths = np.full(4, 8, dtype=np.int32)
    profiles = [MSVProfile.from_profile(parse_hmm(profile_dir / "100.hmm"))]
    scanner = MSVScanner(backend="xla")
    ckpt = ScanCheckpoint(tmp_path / "ckpt")
    resumable_sweep(scanner, profiles, tokens, lengths, ckpt, shard_size=2)
    with pytest.raises(ValueError, match="different partition"):
        resumable_sweep(scanner, profiles, tokens, lengths, ckpt, shard_size=3)


def test_section_timer():
    t = SectionTimer()
    with t.section("a"):
        pass
    with t.section("b"):
        pass
    report = t.report()
    assert "a=" in report and "b=" in report
