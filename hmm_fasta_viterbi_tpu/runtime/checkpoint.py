"""Resumable database scans.

The reference has no checkpointing (scans are seconds-long; SURVEY.md §5)
— at pod scale a sweep over millions of sequences x thousands of
profiles is hours-long and preemptible, so the engine persists per-
(profile, shard) results and skips completed work on restart.

Layout: one ``.npz`` per (profile, shard) under the checkpoint dir plus
a ``manifest.json`` describing the partition, written atomically.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import pathlib

import numpy as np

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class ScanCheckpoint:
    directory: pathlib.Path

    def __init__(self, directory):
        self.directory = pathlib.Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)

    def _chunk_path(self, profile_name: str, shard: int) -> pathlib.Path:
        safe = profile_name.replace("/", "_")
        return self.directory / f"{safe}.shard{shard:05d}.npz"

    def is_done(self, profile_name: str, shard: int) -> bool:
        return self._chunk_path(profile_name, shard).exists()

    def save(self, profile_name: str, shard: int, scores: np.ndarray) -> None:
        path = self._chunk_path(profile_name, shard)
        tmp = path.with_suffix(".tmp.npz")
        np.savez_compressed(tmp, scores=np.asarray(scores, dtype=np.float32))
        os.replace(tmp, path)  # atomic publish

    def load(self, profile_name: str, shard: int) -> np.ndarray:
        with np.load(self._chunk_path(profile_name, shard)) as z:
            return z["scores"]

    def write_manifest(self, meta: dict) -> None:
        tmp = self.directory / "manifest.tmp"
        tmp.write_text(json.dumps(meta, indent=1))
        os.replace(tmp, self.directory / "manifest.json")

    def read_manifest(self) -> dict | None:
        p = self.directory / "manifest.json"
        return json.loads(p.read_text()) if p.exists() else None


def resumable_sweep(
    scanner,
    profiles,
    tokens: np.ndarray,
    lengths: np.ndarray,
    checkpoint: ScanCheckpoint,
    shard_size: int = 4096,
) -> dict[str, np.ndarray]:
    """Scan profiles x database in shards, skipping completed chunks.

    Returns {profile_name: scores [B]}. Safe to kill and rerun: each
    (profile, shard) result publishes atomically once computed.
    """
    b = tokens.shape[0]
    num_shards = -(-b // shard_size)
    manifest = checkpoint.read_manifest()
    meta = {
        "num_sequences": int(b),
        "shard_size": int(shard_size),
        "profiles": [p.name for p in profiles],
    }
    if manifest is not None and (
        manifest.get("num_sequences") != meta["num_sequences"]
        or manifest.get("shard_size") != meta["shard_size"]
    ):
        raise ValueError(
            "checkpoint directory belongs to a different partition: "
            f"{manifest} vs {meta}"
        )
    checkpoint.write_manifest(meta)

    results: dict[str, np.ndarray] = {}
    for profile in profiles:
        parts = []
        for shard in range(num_shards):
            lo, hi = shard * shard_size, min((shard + 1) * shard_size, b)
            if checkpoint.is_done(profile.name, shard):
                parts.append(checkpoint.load(profile.name, shard))
                continue
            staged = scanner.stage(tokens[lo:hi], lengths[lo:hi])
            scores = np.asarray(scanner.scan(profile, staged))
            checkpoint.save(profile.name, shard, scores)
            parts.append(scores)
            logger.info("checkpointed %s shard %d/%d", profile.name, shard + 1, num_shards)
        results[profile.name] = np.concatenate(parts) if parts else np.zeros(0, np.float32)
    return results
