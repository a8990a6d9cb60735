"""Measurement probes behind the committed numbers in BENCH_NOTES.md.

Each script is a standalone TPU measurement (interleaved-min A/B per the
relay-drift rule) cited from kernel docstrings and BENCH_NOTES. Run as
  python -m lowbitdnn_project_tpu.bench.probes.<name> [args]
"""
