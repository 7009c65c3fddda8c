"""LR schedule curves vs analytic values (reference optimizations.py:108-150)."""

import math

import numpy as np

from image_caption_tpu.train.schedules import (
    ReduceLROnPlateau,
    transformer_schedule,
    warmup_cosine_schedule,
)


def test_warmup_cosine_values():
    base, warmup, total, min_lr = 3e-4, 100, 1000, 1e-6
    sched = warmup_cosine_schedule(base, warmup, total, min_lr)
    # warmup: lr = base * step/warmup
    assert abs(float(sched(0)) - 0.0) < 1e-12
    assert abs(float(sched(50)) - base * 0.5) < 1e-10
    # boundary
    assert abs(float(sched(100)) - base) < 1e-9
    # cosine: step 550 -> progress 0.5 -> factor 0.5
    expect = min_lr + (base - min_lr) * 0.5
    assert abs(float(sched(550)) - expect) < 1e-9
    # end: min_lr
    assert abs(float(sched(1000)) - min_lr) < 1e-9


def test_transformer_schedule_values():
    d_model, warmup = 512, 4000
    sched = transformer_schedule(d_model, warmup)
    for step in (1, 100, 4000, 10000):
        expect = (d_model ** -0.5) * min(step ** -0.5, step * warmup ** -1.5)
        assert abs(float(sched(step)) - expect) < 1e-9
    # peak at warmup boundary
    assert float(sched(4000)) >= float(sched(3000))
    assert float(sched(4000)) >= float(sched(6000))


def test_reduce_lr_on_plateau():
    s = ReduceLROnPlateau(factor=0.5, patience=2)
    assert s.step(1.0) == 1.0  # improvement
    assert s.step(1.1) == 1.0
    assert s.step(1.05) == 1.0  # bad 1
    assert s.step(1.05) == 1.0  # bad 2
    assert s.step(1.05) == 0.5  # bad 3 > patience -> halve
    assert s.step(2.0) == 0.5  # improvement doesn't restore lr (torch semantics)
    st = s.state_dict()
    s2 = ReduceLROnPlateau()
    s2.load_state_dict(st)
    assert s2.scale == 0.5
