"""Driver entry points must stay importable and traceable.

The round driver compile-checks ``entry()`` on the real TPU and executes
``dryrun_multichip`` on a virtual mesh; this guards both earlier — a
breakage here means the driver's validation fails at round end.
``entry()`` is only traced/lowered (full ViT-B/32 execution on the 1-core
CPU would be minutes); the dryrun is covered by the heavier parallel tests.
"""

import sys
import pytest
import os

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_entry_traces_and_lowers():
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    # output: (img_hash, txt_hash) with the flagship 64-bit head
    out = jax.eval_shape(fn, *args)
    assert isinstance(out, tuple) and len(out) == 2
    assert out[0].shape[-1] in (64, 128)   # softmax-pair head is 2K wide
    assert lowered is not None
