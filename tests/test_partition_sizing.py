"""Byte-aware shuffle partition sizing (rayutil.default_partitions /
wide_partitions): the ~256 MB/partition multi-node target governs once a
stage's bytes exceed the single-node row heuristic, uncapped above."""

from __future__ import annotations

import os

from ehdc_llpg_address_matching_ray.rayutil import (
    TARGET_PARTITION_BYTES,
    default_partitions,
    wide_partitions,
)


def test_small_corpus_keeps_row_heuristic():
    # both sf test corpora are far below the byte threshold: counts are
    # identical to the row rule (startup-dominated regime)
    assert default_partitions(500, 1 << 20) == 8
    assert default_partitions(1_560_000, 2 << 30) == 32


def test_byte_target_governs_large_stages():
    one_tb = 1 << 40
    assert default_partitions(10_000_000, one_tb) == one_tb // TARGET_PARTITION_BYTES
    # 100 TB -> ~400k partitions, no single-node cap
    assert default_partitions(10_000_000, 100 * one_tb) == 409_600
    # ceil, not floor
    assert default_partitions(0, 10 * TARGET_PARTITION_BYTES + 1) == 11


def test_wide_partitions_byte_floor():
    assert wide_partitions(1_560_000, 2 << 30) == 64  # row rule still wins
    one_tb = 1 << 40
    assert wide_partitions(10_000_000, one_tb) == one_tb // TARGET_PARTITION_BYTES


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("RAY_GRAFT_PARTITIONS", "13")
    assert default_partitions(10_000_000, 1 << 40) == 13
    assert wide_partitions(10_000_000, 1 << 40) == 13
