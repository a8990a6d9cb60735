"""Multi-HOST machinery test: jax.distributed across 2 real processes.

The rest of the parallel suite runs one process with 8 virtual devices;
this spawns 2 CPU processes (4 local devices each) — the DCN analogue —
and runs the DP(+TP) int8 ResNet chain with the data axis spanning the
process boundary. Logits must be BIT-IDENTICAL to single-process: the int8
chain's accumulation is integer and its float epilogues are elementwise,
so no partitioning may change a bit.
"""
from lowbitdnn_project_tpu.parallel.multihost import run_multihost_demo


def test_two_process_dp_tp_bit_identical():
    # run_multihost_demo's own subprocess timeout bounds the test
    r = run_multihost_demo(num_processes=2, local_devices=4, timeout=300)
    assert r["bit_identical"]
    assert r["global_devices"] == 8
    assert r["logits_shape"] == [8, 16]
