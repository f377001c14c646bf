"""dbt-style model unit tests: mocked inputs → expected output rows.

The reference's YAML engine manages a `unit_tests` top-level key
(reference: src/dbt_osmosis/core/schema/parser.py:15-22) but delegates
execution to dbt-core. Here they execute natively: each unit test declares
`given` rows for every ref/source the model reads and `expect` rows for the
model's output; the runner registers the mocks as temp views, compiles the
model against them, runs it on Spark, and compares order-insensitively.

YAML shape (dbt 1.8 unit-test format, trimmed):

    unit_tests:
      - name: test_customers_ltv
        model: customers
        given:
          - input: ref('stg_orders')
            rows:
              - {order_id: 1, customer_id: 1, amount: 10.0}
        expect:
          rows:
            - {customer_id: 1, lifetime_value: 10.0}

Execution is one Spark job per test over inline rows — driver-cheap, and
exactly what CI needs: model logic verified without touching real data.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from dbt_osmosis_spark.compile import JinjaCompiler, relation_name
from dbt_osmosis_spark.project import Manifest

_INPUT_RE = re.compile(r"(ref|source)\(\s*'([^']+)'\s*(?:,\s*'([^']+)'\s*)?\)")


@dataclass
class UnitTestResult:
    name: str
    model: str
    passed: bool
    message: str = ""
    missing: list = field(default_factory=list)  # expected but absent
    unexpected: list = field(default_factory=list)  # present but not expected


def _mock_relation(input_spec: str) -> str:
    """'ref('x')' or 'source('a','b')' → the relation the compiler emits."""
    m = _INPUT_RE.fullmatch(input_spec.strip())
    if not m:
        # bare name = ref
        return relation_name(input_spec.strip())
    kind, a, b = m.groups()
    return relation_name(f"{a}.{b}" if kind == "source" and b else a)


def _norm_rows(rows: list[dict], columns: list[str]) -> set[tuple]:
    out = set()
    for r in rows:
        out.add(tuple(_norm_val(r.get(c)) for c in columns))
    return out


def _norm_val(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def run_unit_test(spark: SparkSession, manifest: Manifest, spec: dict) -> UnitTestResult:
    """Execute one unit-test spec against its model's SQL."""
    name = spec.get("name", "<unnamed>")
    model = spec["model"]
    node = manifest.models.get(model)
    if node is None:
        return UnitTestResult(name, model, False, f"unknown model {model!r}")
    if node.language == "python":
        # dbt contract: unit tests mock SQL models only
        return UnitTestResult(name, model, False, "unit tests support SQL models only")

    # register mocks (shadowing any real relations within this session)
    registered = []
    try:
        for given in spec.get("given") or []:
            rel = _mock_relation(given["input"])
            rows = given.get("rows") or []
            if not rows:
                return UnitTestResult(name, model, False, f"no rows for input {rel}")
            spark.createDataFrame(rows).createOrReplaceTempView(rel)
            registered.append(rel)

        compiled = JinjaCompiler(manifest).compile(node.raw_sql)
        got = spark.sql(compiled.compiled_sql)
        expect_rows = (spec.get("expect") or {}).get("rows") or []
        if not expect_rows:
            return UnitTestResult(name, model, False, "expect.rows missing")
        columns = sorted(expect_rows[0].keys())
        actual = _norm_rows([r.asDict() for r in got.select(*columns).collect()], columns)
        expected = _norm_rows(expect_rows, columns)
        missing = sorted(expected - actual)
        unexpected = sorted(actual - expected)
        ok = not missing and not unexpected
        return UnitTestResult(
            name, model, ok,
            "" if ok else f"{len(missing)} missing / {len(unexpected)} unexpected row(s)",
            missing=missing, unexpected=unexpected,
        )
    finally:
        for rel in registered:
            spark.catalog.dropTempView(rel)


def run_unit_tests_from_doc(
    spark: SparkSession, manifest: Manifest, doc: dict
) -> list[UnitTestResult]:
    """Run every entry under the doc's `unit_tests` key."""
    return [
        run_unit_test(spark, manifest, spec) for spec in doc.get("unit_tests") or []
    ]
