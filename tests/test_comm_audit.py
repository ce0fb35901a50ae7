"""tools/comm_audit.py HLO collective parser: both scalar-result and
XLA's combined tuple-shaped collectives must be counted (gradient
syncs are usually combined; a scalar-only parser silently drops them),
including ROOT-prefixed and async -start forms."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.comm_audit import collectives_in

HLO = """
ENTRY %main {
  %p0 = f32[256,64]{1,0} parameter(0)
  %ar = f32[256,64]{1,0} all-reduce(%p0), replica_groups={}
  %comb = (f32[64,64]{1,0}, f32[64]{0}) all-reduce(%a, %b), replica_groups={}
  ROOT %ag = f32[8,10]{1,0} all-gather(%x), dimensions={1}
  %ars = (f32[32]{0}) all-reduce-start(%y)
  %ard = (f32[32]{0}) all-reduce-done(%ars)
  %dot = f32[256,64]{1,0} dot(%p0, %p0)
}
"""


def test_collectives_in_counts_scalar_tuple_root_async():
    cols = collectives_in(HLO)
    ops = sorted(c["op"] for c in cols)
    assert ops == ["all-gather", "all-reduce", "all-reduce", "all-reduce"]
    by_bytes = sorted(c["bytes"] for c in cols)
    # 32*4=128 (async start), 8*10*4=320 (gather),
    # 64*64*4 + 64*4 = 16640 (combined tuple), 256*64*4 = 65536
    assert by_bytes == [128, 320, 16640, 65536]
    # the non-collective dot contributes nothing
    assert all(c["op"] != "dot" for c in cols)
