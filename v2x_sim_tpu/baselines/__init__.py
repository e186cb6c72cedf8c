"""Locally-runnable reconstructions of the reference pipeline (torch-cpu).

Used as (a) the golden-parity oracle for train.torch_convert — reference
checkpoints-in / predictions-out fidelity (SURVEY.md §4, BASELINE.json) —
and (b) the measured local baseline anchor for bench.py (BASELINE.md).
Not production code: the TPU path never imports this package.
"""
