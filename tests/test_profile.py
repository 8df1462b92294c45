"""dq_rule_report: adversarial rule names (quotes/spaces/reserved words)
must work — names travel as literals, not SQL identifiers (ADVICE r03)."""

from pyspark.sql import functions as F

from vertica_hadoop_integration__spark.operators.profile import dq_rule_report


def test_dq_rule_report_adversarial_names(spark):
    df = spark.createDataFrame([(1, "a"), (-2, None), (3, "c")], ["x", "s"])
    rules = [
        ("x must be >= 0", F.col("x") < 0),
        ("s is n't null -- quote'", F.col("s").isNull()),
        ("select", F.lit(False)),  # reserved word as a rule name
    ]
    got = {r.rule: (r.n_violations, r.n_rows) for r in dq_rule_report(df, rules).collect()}
    assert got == {
        "x must be >= 0": (1, 3),
        "s is n't null -- quote'": (1, 3),
        "select": (0, 3),
    }
