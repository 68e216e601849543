"""Multi-host sharding gate (SURVEY §7 stage 9): record-aligned shard
plans over BGZF block ranges must reproduce the single-host output
byte-exactly when concatenated in shard order."""
import numpy as np
import pytest

from htslib_tpu.parallel.distributed import (decode_shard_to_sam,
                                             plan_bam_shards)
from htslib_tpu.sam import BamReader
from htslib_tpu.sam.batch import bam_stream_to_sam
from tests.conftest import has_ref, ref_path


@pytest.mark.parametrize("n_shards", [1, 2, 4, 7])
def test_shard_concat_equals_whole(n_shards):
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    path = ref_path("range.bam")
    with BamReader(path) as r:
        hdr = r.header
        whole = bam_stream_to_sam(r.fp.read_all(), hdr).tobytes()
    plan = plan_bam_shards(path, n_shards)
    assert sum(s.n_records for s in plan.shards) == 112
    parts = [decode_shard_to_sam(plan, s, hdr) for s in plan.shards]
    assert b"".join(parts) == whole
    # shards are disjoint and cover the record stream contiguously
    for a, b in zip(plan.shards, plan.shards[1:]):
        assert a.uend == b.ustart


def test_shards_balanced():
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    plan = plan_bam_shards(ref_path("range.bam"), 4)
    sizes = [s.uend - s.ustart for s in plan.shards]
    assert max(sizes) < 2 * min(sizes)
