"""Spark DataFrame operators wrapping the pure kernel.

Hot-path rules (BASELINE.json input_hint): Arrow-vectorized pandas UDFs
only — no row-at-a-time ``F.udf``, no RDDs, no driver-side collect loops.
Everything that CAN be a Catalyst column expression IS one (category
projections, heuristics, counters), so Catalyst keeps pruning/pushdown
and whole-stage codegen around the few genuine Python stages.
"""
