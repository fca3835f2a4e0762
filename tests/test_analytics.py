

def test_pr_curve_hand_values(spark):
    """PR sweep against hand-computed tp/fp at each threshold; zero-
    positive input yields NULL recall/f1, never a division abort."""
    from harmonize_search_analyze_spark.operators.analytics import pr_curve

    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 0), (0.8, 1), (0.5, 0), (0.3, 1)],
        ["score", "y"],
    )
    rows = pr_curve(df, "score", "y").collect()
    got = [(r.threshold, r.tp, r.fp, r.precision, r.recall) for r in rows]
    assert got == [
        (0.9, 1, 0, 1.0, round(1 / 3, 6)),
        (0.8, 2, 1, round(2 / 3, 6), round(2 / 3, 6)),
        (0.5, 2, 2, 0.5, round(2 / 3, 6)),
        (0.3, 3, 2, 0.6, 1.0),
    ]
    f1_08 = rows[1].f1
    assert f1_08 == round(2 * (2 / 3) * (2 / 3) / ((2 / 3) + (2 / 3)), 6)

    none_pos = spark.createDataFrame([(0.9, 0), (0.1, 0)], ["score", "y"])
    r = pr_curve(none_pos, "score", "y").collect()
    assert all(x.recall is None and x.f1 is None for x in r)
