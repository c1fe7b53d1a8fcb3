"""Pipeline dataflow semantics (SURVEY.md §1.1.4, §2.10 T6, §2.11 F2).

The reference executes an ordered list of (function, experiment) stages per
thread, passing each stage's payload to the next with optional attribute
renames, under a user-replaceable transition function
(``experiment_caller.py:170-227``, ``pipeline_transition.py:25-27``,
``test/README.md:226-279``).

Spark form: a stage is a DataFrame transform; payload passing is the
DataFrame itself; ``transitions`` renames columns between stages
(P15); the transition function is a driver callback that can rewrite or
short-circuit the remaining plan — exactly the reference's state machine,
but each stage is a distributed plan instead of a FaaS call.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

StageFn = Callable[[DataFrame], DataFrame]
#: F2: (index, stage, df) -> next index; return len(stages) to stop.
TransitionFn = Callable[[int, "Stage", DataFrame], int]


@dataclass
class Stage:
    """One pipeline stage: a named transform plus the attribute renames to
    apply to its *input* (transitions {"message": "name"} semantics)."""

    name: str
    fn: StageFn
    transitions: dict[str, str] = field(default_factory=dict)


def default_transition(index: int, stage: Stage, df: DataFrame) -> int:
    """The reference's default transition: proceed to the next stage
    (pipeline_transition.py:25-27)."""
    return index + 1


def run_pipeline(
    df: DataFrame,
    stages: list[Stage],
    *,
    transition: TransitionFn = default_transition,
    max_steps: int = 100,
) -> DataFrame:
    """T6: execute the stage state machine.  Each step applies input renames
    then the stage transform; the transition callback picks the next stage
    (enabling loops/early exit like the reference's custom transition
    functions).  ``max_steps`` guards runaway user transitions."""
    i, steps = 0, 0
    while 0 <= i < len(stages):
        if steps >= max_steps:
            raise RuntimeError(f"pipeline exceeded max_steps={max_steps}")
        stage = stages[i]
        for src, dst in stage.transitions.items():
            if src in df.columns:
                df = df.withColumnRenamed(src, dst)
        df = stage.fn(df)
        i = transition(i, stage, df)
        steps += 1
    return df
