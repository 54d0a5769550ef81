"""Hot-path lint: no per-row Python, no RDD compute, no driver loops.

BASELINE.json input_hint mandates "vectorized pandas/Arrow UDFs (no
per-row Python) throughout"; SURVEY.md §7 commits to enforcing it with a
lint test.  This scans the package source (AST-level where it matters)
rather than trusting review.
"""

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "top_secret_spark"

# .rdd.getNumPartitions() is metadata, not compute — allowed.
FORBIDDEN_RDD_METHODS = {
    "map", "flatMap", "mapPartitions", "foreach", "reduce", "collect",
    "take", "takeSample", "aggregate", "fold", "glom", "zipWithIndex",
}


def _py_files():
    return sorted(PKG.rglob("*.py"))


def test_no_row_at_a_time_udf():
    """pyspark.sql.functions.udf (row-at-a-time, pickled per row) must
    never appear — only pandas_udf / mapInPandas / applyInPandas*."""
    for path in _py_files():
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module and "pyspark" in node.module:
                for alias in node.names:
                    assert alias.name != "udf", (
                        f"{path}: imports row-at-a-time udf from pyspark"
                    )
            if isinstance(node, ast.Attribute) and node.attr == "udf":
                base = node.value
                if isinstance(base, ast.Name) and base.id in ("F", "functions"):
                    raise AssertionError(f"{path}:{node.lineno}: F.udf call")


def test_no_rdd_compute():
    """RDD compute methods (imperative row loops outside Catalyst/Arrow)
    are forbidden; only partition-count metadata reads are allowed."""
    for path in _py_files():
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, ast.Attribute):
                continue
            # pattern: <expr>.rdd.<method>(...)
            if (
                isinstance(node.value, ast.Attribute)
                and node.value.attr == "rdd"
                and node.attr in FORBIDDEN_RDD_METHODS
            ):
                raise AssertionError(
                    f"{path}:{node.lineno}: .rdd.{node.attr} in package source"
                )


def test_no_iterrows_in_hot_path():
    """pandas .iterrows() (per-row namedtuple materialization) must not
    appear; .itertuples is allowed only in binary-decode operators where
    rows hold variable-length blobs (audio/multimodal)."""
    allowed_itertuples = {"audio.py", "multimodal.py"}
    for path in _py_files():
        src = path.read_text()
        assert ".iterrows(" not in src, f"{path}: uses .iterrows()"
        if ".itertuples(" in src:
            assert path.name in allowed_itertuples, (
                f"{path}: .itertuples outside binary-decode operators"
            )
