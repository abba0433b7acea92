"""Tensor-parallel consistency: same model, tp=1 vs tp=4 on the virtual
CPU mesh must produce (near-)identical logits (role of reference
``compare_two_settings``, tests/utils.py:402)."""

import numpy as np
import pytest


def run_tp(tp_size):
    import __graft_entry__ as g
    config, model, runner = g._build(tp_size=tp_size, tiny=True)
    t_bucket, inputs = g._example_inputs(runner, num_seqs=3, q_len=8)
    logits = runner.debug_forward(inputs)
    return np.asarray(logits[:3])


def test_tp1_vs_tp4_logits_match():
    import sys
    sys.path.insert(0, ".")
    a = run_tp(1)
    b = run_tp(4)
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)


def test_dryrun_multichip():
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as g
    g.dryrun_multichip(8)
