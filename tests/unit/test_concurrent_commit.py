"""Optimistic-concurrency commit guard (core/manifest.py
publish_epoch): identical re-commits stay no-ops (crash replay), a
DIVERGENT commit of an already-committed epoch fails loudly instead of
silently replacing the winning lineage."""

import pytest

from maestro_ray.core.manifest import (
    ConcurrentCommitError,
    manifest_at,
    publish_epoch,
)


def _row(p, rows, checksum):
    return {"partition": p, "row_count": rows, "checksum": checksum,
            "watermark_offset": 10}


def test_identical_recommit_noop(tmp_path):
    lake = str(tmp_path)
    m1 = publish_epoch(lake, 1, 10, [_row(0, 5, 111)], None,
                       num_partitions=4)
    m2 = publish_epoch(lake, 1, 10, [_row(0, 5, 111)], None,
                       num_partitions=4)
    assert m1.to_json() == m2.to_json()


def test_divergent_commit_rejected(tmp_path):
    lake = str(tmp_path)
    publish_epoch(lake, 1, 10, [_row(0, 5, 111)], None, num_partitions=4)
    with pytest.raises(ConcurrentCommitError, match="different content"):
        publish_epoch(lake, 1, 10, [_row(0, 6, 222)], None,
                      num_partitions=4)
    # the winner's manifest is untouched
    assert manifest_at(lake, 1).partitions[0]["rows"] == 5
