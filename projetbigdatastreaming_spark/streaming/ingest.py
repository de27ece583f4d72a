"""Composed streaming curation ingest — the streaming twin of
`plans/quality.py::q_curation_pipeline`.

One foreachBatch function chains the engine's ingest-boundary stages
over each micro-batch of documents:

1. **quality gate** — declarative row checks; passing rows continue,
   violating rows land in quarantine with their failed-check names
   (`runner.quality_gate_writer` semantics).
2. **near-dup flagging** — the gated batch is signed and probed
   against the corpus-so-far MinHash-LSH band index, exact-verified,
   then folded into the index (`neardup.near_dup_batch_writer`).
3. **sketch fold-in** — the gated batch's count-min grid folds into
   the persistent CMS so ingest-side heavy-hitter estimates stay
   queryable while the stream runs (`sketches.cms_batch_writer`).

Every sink in the chain is replay-safe the same way (batch_id dynamic
partition overwrite), so the COMPOSITION inherits the at-least-once →
effectively-exactly-once contract: a redelivered batch rewrites its
own partitions in every table it touched.

Scale: stage 1 is codegen predicates; stage 2's cost tracks near-dup
density (band equi-joins); stage 3 writes ≤ d·w rows per batch.  The
batch DataFrame is cached once and consumed by all three stages.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from .neardup import near_dup_batch_writer
from .runner import quality_gate_writer
from .sketches import cms_batch_writer


def curation_ingest_writer(
    checks: dict[str, str],
    good_path: str,
    quarantine_path: str,
    neardup_index_dir: str,
    neardup_flags_dir: str,
    cms_state_dir: str,
    neardup_threshold: float = 0.8,
    text_col: str = "text",
    cms_key_col: str = "source",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function running the full ingest chain."""
    gate = quality_gate_writer(checks, good_path, quarantine_path)
    near = near_dup_batch_writer(
        neardup_index_dir,
        neardup_flags_dir,
        threshold=neardup_threshold,
        text_col=text_col,
    )
    cms = cms_batch_writer(cms_state_dir, cms_key_col)

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pyspark.sql import functions as F

        batch_df = batch_df.cache()
        try:
            gate(batch_df, batch_id)
            # downstream stages see only gated rows — the gate's EXACT
            # routing semantics (codegen, evaluated again on the
            # cached batch rather than re-read from the good table).
            # The gate flags a violation only when ~expr is TRUE, so a
            # NULL-evaluating check PASSES ("value > 0" with NULL
            # value routes to the good table); a bare WHERE would drop
            # NULL and silently exclude those documents from the
            # near-dup index and CMS — hence coalesce(expr, true)
            passed = batch_df.where(
                F.expr(
                    " AND ".join(
                        f"coalesce(({e}), true)" for e in checks.values()
                    )
                )
                if checks
                else F.lit(True)
            )
            near(passed, batch_id)
            cms(passed, batch_id)
        finally:
            batch_df.unpersist()

    return _fn
