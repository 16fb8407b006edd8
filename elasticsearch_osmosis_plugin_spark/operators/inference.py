"""Inference endpoint registry — the engine's analog of ES's
``PUT _inference/<task_type>/<id>`` (ES 8.15+, the object RERANK /
COMPLETION resolve their ``inference_id`` against;
reference: the plugin delegates all query-time behavior to the ES
server, ESNodeITest.java:184-188 runs against the node that owns
this surface).

ES registers inference endpoints cluster-wide and the query languages
reference them by id; here the registry is module-global (the
process is the cluster) and an endpoint is a plain Python callable:

- task_type ``rerank``: ``fn(query: str, texts: pandas.Series)
  -> sequence of float`` — executed as ONE Arrow-batched pandas UDF
  over the rerank window (never per-row Python).
- task_type ``completion``: ``fn(prompts: pandas.Series)
  -> sequence of str`` — same Arrow batching.

The engine ships one builtin, ``lexical-rerank`` (task_type rerank):
query-term coverage ``|distinct field tokens ∩ query terms| /
|query terms|`` under the ``simple`` analyzer. It is special-cased by
the ES|QL compiler to a PURE CATALYST expression (array_intersect
over tokenize_expr — whole-stage codegen, no UDF, exactly
oracle-expressible), standing in for ES's default
``.rerank-v1-elasticsearch`` endpoint: a deterministic relevance
model the engine can verify value-for-value. Model-backed endpoints
(cross-encoders, LLMs) are the user-registered path — the sandbox has
no inference runtime, so the engine's contract is the registry + the
Arrow batch plumbing, mirroring how the multimodal decode column
treats heavy codecs.
"""

from __future__ import annotations

from typing import Callable

__all__ = ["put_inference", "get_inference", "delete_inference",
           "list_inference", "LEXICAL_RERANK"]

LEXICAL_RERANK = "lexical-rerank"
_TASK_TYPES = ("rerank", "completion")


class _Builtin:
    """Marker for compiler-special-cased endpoints."""

    def __init__(self, name: str, task_type: str):
        self.name, self.task_type = name, task_type

    def __call__(self, *a, **k):  # pragma: no cover - compiler handles
        raise TypeError(f"builtin endpoint {self.name!r} is compiled "
                        "inline, not called")


_REGISTRY: dict[str, tuple[str, Callable]] = {
    LEXICAL_RERANK: ("rerank", _Builtin(LEXICAL_RERANK, "rerank")),
}


def put_inference(inference_id: str, task_type: str,
                  fn: Callable) -> None:
    """Register an endpoint (ES ``PUT _inference/<task>/<id>``).
    Re-putting an id replaces it; builtin ids are protected."""
    if task_type not in _TASK_TYPES:
        raise ValueError(f"inference task_type must be one of "
                         f"{_TASK_TYPES}, got {task_type!r}")
    if inference_id == LEXICAL_RERANK:
        raise ValueError(f"{LEXICAL_RERANK!r} is a builtin endpoint")
    if not callable(fn):
        raise TypeError("inference endpoint must be callable")
    _REGISTRY[inference_id] = (task_type, fn)


def get_inference(inference_id: str, task_type: str) -> Callable:
    """Resolve an endpoint, checking the task type (ES returns 404 /
    a task-type mismatch error the same way)."""
    got = _REGISTRY.get(inference_id)
    if got is None:
        raise KeyError(
            f"unknown inference endpoint {inference_id!r}; register "
            f"it with put_inference(id, task_type, fn). Known: "
            f"{sorted(_REGISTRY)}")
    tt, fn = got
    if tt != task_type:
        raise KeyError(f"inference endpoint {inference_id!r} has "
                       f"task_type {tt!r}, not {task_type!r}")
    return fn


def delete_inference(inference_id: str) -> None:
    if inference_id == LEXICAL_RERANK:
        raise ValueError(f"{LEXICAL_RERANK!r} is a builtin endpoint")
    _REGISTRY.pop(inference_id, None)


def list_inference() -> dict[str, str]:
    """{inference_id: task_type} — ES ``GET _inference/_all``."""
    return {k: v[0] for k, v in sorted(_REGISTRY.items())}
