"""Failure recovery: supervised auto-restart around checkpointed training.

The reference has no failure handling at all — crash recovery is "re-run the
script and load last.ckpt by hand" (SURVEY.md §5; the manual pattern shows at
``scripts/train_diffusion.py:134-135``). Here the restart+restore pattern is
a first-class supervisor: the training callable persists progress through
orbax checkpoints (``medfusion_tpu.utils.checkpoint``), and on an unexpected
exception the supervisor re-invokes it with ``resume=True`` so it restores
from the latest checkpoint and continues. Bounded restarts; the original
exception propagates when the budget is exhausted.

Used by ``cli/train_diffusion --auto-restart N``; fault-injection test in
``tests/test_resilience.py``.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple, Type


def run_with_auto_restore(
    attempt: Callable[[bool], object],
    max_restarts: int = 3,
    retry_on: Tuple[Type[BaseException], ...] = (Exception,),
    backoff_s: float = 0.0,
    on_failure: Callable[[BaseException, int], None] = None,
):
    """Run ``attempt(resume)`` until it returns; restart on failure.

    ``attempt`` is called with ``resume=False`` first (the caller decides
    whether that first run itself resumes) and ``resume=True`` after every
    failure. Returns whatever ``attempt`` returns. ``KeyboardInterrupt`` and
    other ``BaseException``s outside ``retry_on`` always propagate.
    """
    restarts = 0
    resume = False
    while True:
        try:
            return attempt(resume)
        except retry_on as e:  # noqa: PERF203 - supervision loop
            restarts += 1
            if restarts > max_restarts:
                raise
            if on_failure is not None:
                on_failure(e, restarts)
            else:
                print(f"[auto-restart {restarts}/{max_restarts}] "
                      f"{type(e).__name__}: {e} — restoring from the latest "
                      f"checkpoint")
            if backoff_s:
                time.sleep(backoff_s * restarts)
            resume = True
