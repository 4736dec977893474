

def test_ewma_matches_recurrence_reference(spark):
    from pixelspark.ops.windows import ewma

    rows = [("a", i, float(v)) for i, v in enumerate([10, 0, 5, 5, 20])]
    rows += [("b", 0, 7.0), ("b", 1, 7.0)]
    df = spark.createDataFrame(rows, "k string, t int, x double")
    got = {(r["k"], r["t"]): r["ewma"]
           for r in ewma(df, ["k"], "t", "x", alpha=0.5).collect()}

    def ref(series, a=0.5):
        out, y = [], None
        for x in series:
            y = x if y is None else (1 - a) * y + a * x
            out.append(y)
        return out

    for k, series in (("a", [10, 0, 5, 5, 20]), ("b", [7, 7])):
        for t, want in enumerate(ref([float(v) for v in series])):
            assert abs(got[(k, t)] - want) < 1e-12, (k, t)
