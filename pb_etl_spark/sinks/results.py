"""Results-table sink + REST serving (SURVEY.md §2.1 S9/S10).

The reference loads its one-row (expected, actual) report into a relational
``results_table`` by deleting all rows and bulk-inserting
(/root/reference/pb_etl_app/management/commands/etl.py:33-39), then serves
it read-only over HTTP as JSON (views.py:7-9, urls.py:6-15).

Here: the report frame is written overwrite-style into a SQLite table via
the stdlib driver (the reference's default Django backend is SQLite too);
on a cluster the same call shape targets ``df.write.jdbc``. The serving
layer is a stdlib HTTP server reading the table — serving is an adapter
over the engine's output, not part of the engine (SURVEY.md §2.1 S10).

Driver-side collect is correct here by design: the result is one row
(the reference's ModelResults), not a dataset.
"""

from __future__ import annotations

import json
import sqlite3
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from pyspark.sql import DataFrame

RESULTS_TABLE = "results_table"


def write_results(df: DataFrame, db_path: str, table: str = RESULTS_TABLE) -> int:
    """Overwrite-load a small report frame into SQLite (delete-all +
    bulk-insert, parity with etl.py:33-39). Returns rows written."""
    rows = df.collect()
    cols = df.columns
    with sqlite3.connect(db_path) as con:
        col_defs = ", ".join(f"{c} REAL" for c in cols)
        con.execute(f"CREATE TABLE IF NOT EXISTS {table} ({col_defs})")
        con.execute(f"DELETE FROM {table}")
        placeholders = ", ".join("?" for _ in cols)
        con.executemany(
            f"INSERT INTO {table} VALUES ({placeholders})",
            # NULLs pass through (e.g. avg() over an empty backtest);
            # sqlite coerces the rest
            [
                tuple(None if r[c] is None else float(r[c]) for c in cols)
                for r in rows
            ],
        )
        con.commit()
    return len(rows)


def read_results(db_path: str, table: str = RESULTS_TABLE) -> list[dict]:
    with sqlite3.connect(db_path) as con:
        con.row_factory = sqlite3.Row
        return [dict(r) for r in con.execute(f"SELECT * FROM {table}")]


def chart_page(rows: list[dict]) -> str:
    """Expected-vs-actual bar chart page (parity with the reference's
    Vega-Lite template, pb_etl_app/templates/pb_etl_app/index.html:21-39
    and README.md:113-121). The reference fetches the results row with a
    coreapi client and embeds a v3 spec; here the server inlines the same
    two-bar spec (values server-rendered — no API round trip), current
    vega-lite, same CDN."""
    values = []
    if rows:
        first = rows[0]
        values = [
            {"name": k, "value": first[k]}
            for k in ("expected", "actual")
            if k in first and first[k] is not None
        ] or [{"name": k, "value": v} for k, v in first.items() if v is not None]
    spec = {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "description": "Actual vs Forecast",
        "width": 500,
        "height": 250,
        "data": {"values": values},
        "mark": {"type": "bar"},
        "encoding": {
            "x": {"field": "name", "type": "nominal", "axis": {"labelAngle": 0}},
            "y": {"field": "value", "type": "quantitative"},
        },
    }
    return f"""<!DOCTYPE html>
<html><head>
<script src="https://cdn.jsdelivr.net/npm/vega@5"></script>
<script src="https://cdn.jsdelivr.net/npm/vega-lite@5"></script>
<script src="https://cdn.jsdelivr.net/npm/vega-embed@6"></script>
</head><body>
<h3>Actual vs Forecast</h3>
<div id="vis"></div>
<script type="text/javascript">
vegaEmbed('#vis', {json.dumps(spec)});
</script>
</body></html>"""


class ResultsServer:
    """Read-only serving over the results table:
    GET /api/results/ → JSON list (parity with the reference's DRF
    ResultsViewSet route /the_app/api/results/);
    GET / → expected-vs-actual Vega-Lite chart page (parity with the
    reference's index template)."""

    def __init__(self, db_path: str, host: str = "127.0.0.1", port: int = 0):
        db = db_path

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                path = self.path.rstrip("/")
                if path == "/api/results":
                    body = json.dumps(read_results(db)).encode()
                    ctype = "application/json"
                elif path == "":
                    body = chart_page(read_results(db)).encode()
                    ctype = "text/html"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        self._httpd = HTTPServer((host, port), Handler)
        self.port = self._httpd.server_port
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._httpd.shutdown()
        self._httpd.server_close()
