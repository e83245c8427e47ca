"""extract_tables (operators/weblinks): attributes tolerated, multiple
tables indexed, binary html accepted, malformed fragments ignored."""

from __future__ import annotations

from skyway_spark.operators.weblinks import extract_tables


def _pages(spark, rows, binary=False):
    df = spark.createDataFrame(rows, "url string, html string")
    if binary:
        from pyspark.sql import functions as F

        df = df.select("url", F.encode("html", "utf-8").alias("html"))
    return df


def test_attributes_and_multiple_tables(spark):
    html = (
        '<html><table border="1"><tr class="x"><td align="l">a</td>'
        "<td>b</td></tr></table>"
        "<p>noise</p><table><tr><td>c</td></tr></table></html>"
    )
    got = sorted(
        (r.table_idx, r.row_idx, r.col_idx, r.cell)
        for r in extract_tables(_pages(spark, [("u", html)])).collect()
    )
    assert got == [(0, 0, 0, "a"), (0, 0, 1, "b"), (1, 0, 0, "c")]


def test_binary_html_and_no_tables(spark):
    rows = [("u1", "<html><body>plain</body></html>"),
            ("u2", "<table><tr><td>x</td></tr></table>")]
    got = extract_tables(_pages(spark, rows, binary=True)).collect()
    assert [(r.url, r.cell) for r in got] == [("u2", "x")]


def test_unclosed_table_ignored(spark):
    # lazy regex requires the closing tag: an unterminated table yields
    # nothing rather than swallowing the rest of the page
    rows = [("u", "<table><tr><td>a</td></tr>"
                  "<table><tr><td>b</td></tr></table>")]
    got = sorted(
        (r.table_idx, r.row_idx, r.col_idx, r.cell)
        for r in extract_tables(_pages(spark, rows)).collect()
    )
    # lazy match spans earliest <table> to earliest </table>: one
    # fragment, both <tr>s inside it
    assert got == [(0, 0, 0, "a"), (0, 1, 0, "b")]
