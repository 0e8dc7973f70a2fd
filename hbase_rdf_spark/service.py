"""HTTP SPARQL endpoint — the reference's query-service surface.

The reference ships a Fuseki assembler config + launcher exposing its
engine over the SPARQL protocol (reference: fuseki-config-hbase.ttl,
runHBaseSparqlEngine.sh). This module reproduces that user-facing
surface with the stdlib only: a ``ThreadingHTTPServer`` front-end over
``KgEngine.sql``.

Protocol subset (SPARQL 1.1 Protocol):

- ``GET /sparql?query=…``
- ``POST /sparql`` with ``application/x-www-form-urlencoded``
  (``query=…``) or a raw ``application/sparql-query`` body

Responses content-negotiate the W3C result formats, like the
reference's Fuseki front-end: SELECT/ASK serve the SPARQL 1.1 Query
Results JSON format by default (``head/vars`` + ``results/bindings``;
ASK → ``boolean``), or XML / CSV / TSV on ``Accept``;
CONSTRUCT/DESCRIBE serve ``application/n-triples``. Terms are
classified from their stored lexical forms: ``_:…`` → bnode,
``"lex"@lang`` / ``"lex"^^<dt>`` → tagged/typed literal, numeric
rendering → xsd:double literal, anything else → uri.

Concurrency: each HTTP request runs the query on its own driver
thread; Spark's scheduler interleaves the jobs (enable the FAIR pool
for latency fairness under mixed load). ``max_rows`` caps the driver
collect — the endpoint serves interactive queries, not bulk export
(use the DataFrame API / parquet sinks for that).
"""

from __future__ import annotations

import json
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_LANG_RX = re.compile(r'^"(.*)"@([A-Za-z0-9-]+)$', re.S)
_DT_RX = re.compile(r'^"(.*)"\^\^<([^<>]*)>$', re.S)
_NUM_RX = re.compile(r"^-?[0-9]+(\.[0-9]+(E-?[0-9]+)?)?$")

XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"


XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"

# term kinds carried by the engine's __k_{var} sidecars
# (functions/encoding.py: KIND_ENTITY, KIND_STRING, KIND_NUMERIC)
_KIND_ENTITY, _KIND_STRING, _KIND_NUMERIC = 0, 1, 2


def _json_term(value, kind: int | None = None) -> dict | None:
    """Stored lexical form (+ optional exact term kind) → SPARQL-results-
    JSON term object.

    When the engine supplies ``kind`` (``execute(..., with_kinds=True)``)
    classification is exact; without it (legacy direct callers,
    aggregate scalar columns) the lexical heuristic applies — which can
    mistype a plain literal shaped like "n/a" or "foo:bar" as a uri
    (ADVICE r2), hence the sidecar path is what the service uses.
    """
    if value is None:
        return None
    if isinstance(value, bool):
        return {"type": "literal", "value": "true" if value else "false"}
    if isinstance(value, int):
        return {"type": "literal", "value": str(value),
                "datatype": XSD_INTEGER}
    if isinstance(value, float):
        return {"type": "literal", "value": repr(value),
                "datatype": XSD_DOUBLE}
    s = str(value)
    if kind == _KIND_ENTITY:
        if s.startswith("_:"):
            return {"type": "bnode", "value": s[2:]}
        return {"type": "uri", "value": s}
    if kind == _KIND_NUMERIC:
        return {"type": "literal", "value": s, "datatype": XSD_DOUBLE}
    if kind == _KIND_STRING:
        m = _LANG_RX.match(s)
        if m:
            return {"type": "literal", "value": m.group(1),
                    "xml:lang": m.group(2)}
        m = _DT_RX.match(s)
        if m:
            return {"type": "literal", "value": m.group(1),
                    "datatype": m.group(2)}
        return {"type": "literal", "value": s}
    # no kind available: lexical heuristic (legacy behavior)
    if s.startswith("_:"):
        return {"type": "bnode", "value": s[2:]}
    m = _LANG_RX.match(s)
    if m:
        return {"type": "literal", "value": m.group(1), "xml:lang": m.group(2)}
    m = _DT_RX.match(s)
    if m:
        return {"type": "literal", "value": m.group(1), "datatype": m.group(2)}
    if _NUM_RX.match(s):
        return {"type": "literal", "value": s, "datatype": XSD_DOUBLE}
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", s) or "/" in s:
        return {"type": "uri", "value": s}
    return {"type": "literal", "value": s}


def results_json(df, max_rows: int = 10_000, is_ask: bool | None = None) -> dict:
    """DataFrame (from KgEngine.sql) → SPARQL 1.1 JSON results dict.

    ``is_ask`` keys the boolean response on the QUERY FORM (the service
    passes it from the parsed query); ``None`` falls back to the legacy
    column-name heuristic for direct callers. ``__k_{var}`` sidecar
    columns, when present, type each term exactly and are never emitted.
    """
    cols = [c for c in df.columns if not c.startswith("__k_")]
    if is_ask is None:
        is_ask = cols == ["ask"] and dict(df.dtypes).get("ask") == "boolean"
    if is_ask:
        return {"head": {}, "boolean": bool(df.collect()[0][0])}
    have_kind = {c for c in df.columns if c.startswith("__k_")}
    # LIMIT is part of the plan (CollectLimit), not a post-collect
    # truncation: executors stop producing past max_rows, so a query
    # endpoint fronting a huge result ships at most max_rows rows to
    # the driver.
    rows = df.limit(max_rows).collect()
    bindings = []
    for r in rows:
        b = {}
        for c in cols:
            k = r[f"__k_{c}"] if f"__k_{c}" in have_kind else None
            t = _json_term(r[c], kind=k)
            if t is not None:  # unbound (OPTIONAL) vars are omitted
                b[c] = t
        bindings.append(b)
    return {"head": {"vars": cols}, "results": {"bindings": bindings}}


# datatypes whose literals the engine stores as KIND_NUMERIC (same set
# the N-Triples reader folds to numbers — sources/ntriples.py)
_NUMERIC_DTS = {
    f"http://www.w3.org/2001/XMLSchema#{t}"
    for t in ("double", "float", "decimal", "integer",
              "long", "int", "short", "byte")
}


def term_from_json(t: dict | None):
    """SPARQL-results-JSON term object → the engine's VALUES-cell
    representation (inverse of ``_json_term``): ``UNDEF`` for an absent
    binding, a plain float for a numeric literal (KIND_NUMERIC), else a
    ``(stored_lexical, kind)`` tuple — IRIs/bnodes as KIND_ENTITY,
    plain/tagged/typed literals re-serialized to the store's raw label
    forms (``lex``, ``"lex"@lang``, ``"lex"^^<dt>``) as KIND_STRING."""
    from hbase_rdf_spark.plans.sparql import UNDEF

    if t is None:
        return UNDEF
    ty, v = t.get("type"), t.get("value", "")
    if ty == "uri":
        return (v, _KIND_ENTITY)
    if ty == "bnode":
        return (f"_:{v}", _KIND_ENTITY)
    # literal / typed-literal
    lang = t.get("xml:lang")
    if lang:
        return (f'"{v}"@{lang}', _KIND_STRING)
    dt = t.get("datatype")
    if dt in _NUMERIC_DTS:
        try:
            return float(v)
        except ValueError:
            return (f'"{v}"^^<{dt}>', _KIND_STRING)  # malformed numeric
    if dt:
        return (f'"{v}"^^<{dt}>', _KIND_STRING)
    return (v, _KIND_STRING)


# SERVICE-client guardrails (round 5, VERDICT r4 #7). Env-overridable
# so a deployment can tune them without code changes; the SERVICE
# evaluator passes these defaults through.
SERVICE_TIMEOUT = float(os.environ.get("SPARK_GRAFT_SERVICE_TIMEOUT", 30.0))
SERVICE_MAX_ROWS = int(os.environ.get("SPARK_GRAFT_SERVICE_MAX_ROWS", 100_000))
SERVICE_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_SERVICE_MAX_BYTES", 256 * 1024 * 1024)
)
SERVICE_RETRIES = int(os.environ.get("SPARK_GRAFT_SERVICE_RETRIES", 2))


def fetch_bindings(
    endpoint: str,
    query: str,
    timeout: float | None = None,
    max_rows: int | None = None,
    max_bytes: int | None = None,
    retries: int | None = None,
) -> tuple[list[str], list[list]]:
    """SERVICE-clause client: POST ``query`` to a SPARQL 1.1 Protocol
    endpoint and return ``(vars, rows)`` where each row holds one
    VALUES-cell per var (``term_from_json`` representation, ``UNDEF``
    for unbound).

    Uses the raw ``application/sparql-query`` POST body (the protocol's
    canonical form, no URL-length limit). Raises ``RuntimeError`` on
    transport or protocol failure — the SERVICE evaluator maps that to
    an error (plain SERVICE) or the unit solution (SERVICE SILENT,
    SPARQL 1.1 Federated Query §4).

    Guardrails (a remote endpoint is the one part of a query plan this
    engine doesn't control):

    - ``timeout`` bounds EACH attempt (connect + read), so a hanging
      endpoint fails the query instead of stalling it indefinitely;
    - transient transport failures and HTTP 5xx retry up to
      ``retries`` times with doubling backoff (0.2 s base); HTTP 4xx
      and malformed payloads fail fast — they won't heal on retry;
    - the response body streams in chunks against ``max_bytes`` and
      the parsed bindings check against ``max_rows``: the SERVICE
      solution sequence materializes driver-side before the VALUES
      join, so an unexpectedly fat remote result must fail with a
      clear message rather than OOM the driver."""
    import time as _time
    import urllib.error
    import urllib.request

    timeout = SERVICE_TIMEOUT if timeout is None else timeout
    max_rows = SERVICE_MAX_ROWS if max_rows is None else max_rows
    max_bytes = SERVICE_MAX_BYTES if max_bytes is None else max_bytes
    retries = SERVICE_RETRIES if retries is None else retries

    def _attempt() -> bytes:
        req = urllib.request.Request(
            endpoint,
            data=query.encode(),
            headers={
                "Content-Type": "application/sparql-query",
                "Accept": "application/sparql-results+json",
            },
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            chunks, size = [], 0
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    return b"".join(chunks)
                size += len(chunk)
                if size > max_bytes:
                    raise _ServiceTooLarge(
                        f"response exceeds {max_bytes} bytes"
                    )
                chunks.append(chunk)

    body = None
    last_ex: Exception | None = None
    for i in range(retries + 1):
        try:
            body = _attempt()
            break
        except urllib.error.HTTPError as ex:
            last_ex = ex
            if ex.code < 500:  # client error: retrying can't help
                break
        except _ServiceTooLarge as ex:
            raise RuntimeError(f"SERVICE <{endpoint}> failed: {ex}") from ex
        except (OSError, urllib.error.URLError) as ex:
            last_ex = ex
        if i < retries:
            _time.sleep(0.2 * (2 ** i))
    if body is None:
        raise RuntimeError(
            f"SERVICE <{endpoint}> failed after {retries + 1} "
            f"attempt(s): {last_ex}"
        ) from last_ex
    try:
        payload = json.loads(body.decode())
    except (UnicodeDecodeError, json.JSONDecodeError) as ex:
        raise RuntimeError(f"SERVICE <{endpoint}> failed: {ex}") from ex
    if "error" in payload or "results" not in payload:
        raise RuntimeError(
            f"SERVICE <{endpoint}> failed: "
            f"{payload.get('error', 'no results section')}"
        )
    bindings = payload["results"]["bindings"]
    if len(bindings) > max_rows:
        raise RuntimeError(
            f"SERVICE <{endpoint}> returned {len(bindings)} rows, over "
            f"the {max_rows}-row cap (raise SPARK_GRAFT_SERVICE_MAX_ROWS "
            "or narrow the SERVICE group)"
        )
    head_vars = list(payload.get("head", {}).get("vars", []))
    rows = [
        [term_from_json(b.get(v)) for v in head_vars]
        for b in bindings
    ]
    return head_vars, rows


class _ServiceTooLarge(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# Result serializers beyond JSON — the reference's Fuseki front-end
# content-negotiates all W3C result formats (SPARQL 1.1 Protocol §§5-6);
# these reproduce the ones its test clients use. CSV/TSV/XML are pure
# functions over the results-JSON payload (so term typing stays exact,
# via the same __k_{var} sidecar path); CONSTRUCT/DESCRIBE serialize as
# N-Triples from the triple DataFrame's __k_s/__k_p/__k_o sidecars.
# ---------------------------------------------------------------------------


def _nt_term(value, kind: int | None) -> str:
    """Stored lexical form + term kind → one N-Triples term."""
    if isinstance(value, float):
        return f'"{value!r}"^^<{XSD_DOUBLE}>'
    s = str(value)
    if kind == _KIND_ENTITY or (kind is None and not s.startswith('"')):
        return s if s.startswith("_:") else f"<{s}>"
    if kind == _KIND_NUMERIC:
        return f'"{s}"^^<{XSD_DOUBLE}>'
    # string literal: lang-tagged / typed stored forms are already
    # N-Triples syntax (sources/ntriples.py stores them verbatim)
    if _LANG_RX.match(s) or _DT_RX.match(s):
        return s
    esc = (
        s.replace("\\", "\\\\").replace('"', '\\"')
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )
    return f'"{esc}"'


def results_ntriples(df, max_rows: int = 10_000) -> str:
    """CONSTRUCT/DESCRIBE DataFrame (s,p,o [+ __k_* sidecars]) →
    ``application/n-triples`` body."""
    have = set(df.columns)
    rows = df.limit(max_rows).collect()
    out = []
    for r in rows:
        terms = [
            _nt_term(r[pos], r[f"__k_{pos}"] if f"__k_{pos}" in have else None)
            for pos in ("s", "p", "o")
        ]
        out.append(" ".join(terms) + " .")
    return "\n".join(out) + ("\n" if out else "")


def _plain_value(t: dict) -> str:
    """Results-JSON term object → the CSV 'plain value' (SPARQL 1.1
    Query Results CSV format: IRIs bare, literal lexical forms bare,
    bnodes ``_:label``)."""
    if t["type"] == "bnode":
        return "_:" + t["value"]
    return t["value"]


def results_csv(payload: dict) -> str:
    """SELECT results → SPARQL 1.1 Query Results CSV (RFC 4180)."""
    cols = payload["head"]["vars"]

    def cell(t):
        if t is None:
            return ""
        v = _plain_value(t)
        if any(c in v for c in ',"\n\r'):
            v = '"' + v.replace('"', '""') + '"'
        return v

    lines = [",".join(cols)]
    for b in payload["results"]["bindings"]:
        lines.append(",".join(cell(b.get(c)) for c in cols))
    return "\r\n".join(lines) + "\r\n"


def results_tsv(payload: dict) -> str:
    """SELECT results → SPARQL 1.1 Query Results TSV (terms in
    N-Triples/Turtle syntax, header vars keep their ``?``)."""
    cols = payload["head"]["vars"]

    def cell(t):
        if t is None:
            return ""
        ty, v = t["type"], t["value"]
        if ty == "uri":
            return f"<{v}>"
        if ty == "bnode":
            return f"_:{v}"
        esc = (
            v.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
        )
        if t.get("xml:lang"):
            return f'"{esc}"@{t["xml:lang"]}'
        if t.get("datatype"):
            return f'"{esc}"^^<{t["datatype"]}>'
        return f'"{esc}"'

    lines = ["\t".join("?" + c for c in cols)]
    for b in payload["results"]["bindings"]:
        lines.append("\t".join(cell(b.get(c)) for c in cols))
    return "\n".join(lines) + "\n"


def results_xml(payload: dict) -> str:
    """SELECT/ASK results → SPARQL Query Results XML Format."""
    from xml.sax.saxutils import escape, quoteattr

    ns = "http://www.w3.org/2005/sparql-results#"
    if "boolean" in payload:
        return (
            f'<?xml version="1.0"?>\n<sparql xmlns="{ns}"><head/>'
            f'<boolean>{"true" if payload["boolean"] else "false"}</boolean>'
            f"</sparql>\n"
        )
    cols = payload["head"]["vars"]
    head = "".join(f"<variable name={quoteattr(c)}/>" for c in cols)
    results = []
    for b in payload["results"]["bindings"]:
        parts = []
        for c in cols:
            t = b.get(c)
            if t is None:
                continue
            ty, v = t["type"], escape(t["value"])
            if ty == "uri":
                body = f"<uri>{v}</uri>"
            elif ty == "bnode":
                body = f"<bnode>{v}</bnode>"
            elif t.get("xml:lang"):
                body = f"<literal xml:lang={quoteattr(t['xml:lang'])}>{v}</literal>"
            elif t.get("datatype"):
                body = f"<literal datatype={quoteattr(t['datatype'])}>{v}</literal>"
            else:
                body = f"<literal>{v}</literal>"
            parts.append(f"<binding name={quoteattr(c)}>{body}</binding>")
        results.append("<result>" + "".join(parts) + "</result>")
    return (
        f'<?xml version="1.0"?>\n<sparql xmlns="{ns}">'
        f"<head>{head}</head><results>{''.join(results)}</results></sparql>\n"
    )


_CTYPES = {
    "json": "application/sparql-results+json",
    "xml": "application/sparql-results+xml",
    "csv": "text/csv; charset=utf-8",
    "tsv": "text/tab-separated-values; charset=utf-8",
    "nt": "application/n-triples",
}


def _negotiate(accept: str | None, form: str) -> str:
    """Pick a response format from the Accept header and query form.
    CONSTRUCT/DESCRIBE always serve N-Triples (their result is a
    graph); ASK serves JSON unless XML is asked for (the CSV/TSV
    formats define SELECT only); default stays results-JSON."""
    if form in ("construct", "describe"):
        return "nt"
    a = (accept or "").lower()
    if "sparql-results+json" in a or "application/json" in a:
        return "json"
    if "sparql-results+xml" in a or "application/xml" in a:
        return "xml"
    if form == "ask":
        return "json"
    if "text/csv" in a:
        return "csv"
    if "tab-separated-values" in a:
        return "tsv"
    return "json"


class SparqlService:
    """Threaded HTTP server exposing one engine at ``/sparql``."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 3030,
                 max_rows: int = 10_000):
        self.engine = engine
        self.host = host
        self.port = port
        self.max_rows = max_rows
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- request handling ------------------------------------------------
    def _handle(
        self, query: str, accept: str | None = None
    ) -> tuple[int, str, str]:
        """→ (status, body, content-type). Errors are always JSON."""
        try:
            from hbase_rdf_spark.plans.sparql import parse as _parse

            q = _parse(query)
            fmt = _negotiate(accept, q.form)
            # exact per-term kinds for SELECT and for graph-form
            # serialization; ASK keyed on the parsed query form, not
            # the output column name (ADVICE r2)
            df = self.engine.sql(
                q, with_kinds=q.form in ("select", "construct", "describe")
            )
            if fmt == "nt":
                return 200, results_ntriples(df, self.max_rows), _CTYPES["nt"]
            payload = results_json(df, self.max_rows, is_ask=q.form == "ask")
            if fmt == "xml":
                body = results_xml(payload)
            elif fmt == "csv":
                body = results_csv(payload)
            elif fmt == "tsv":
                body = results_tsv(payload)
            else:
                body = json.dumps(payload)
            return 200, body, _CTYPES[fmt]
        except ValueError as ex:  # SparqlSyntaxError and semantic errors
            return 400, json.dumps({"error": str(ex)}), _CTYPES["json"]
        except Exception as ex:  # pragma: no cover - defensive
            return (
                500,
                json.dumps({"error": f"{type(ex).__name__}: {ex}"}),
                _CTYPES["json"],
            )

    def _handle_update(self, text: str) -> tuple[int, str, str]:
        """SPARQL 1.1 Protocol update operation → JSON ack with the
        quad counts actually changed (Fuseki's update service parity)."""
        try:
            stats = self.engine.update(text)
            return 200, json.dumps(stats), _CTYPES["json"]
        except ValueError as ex:
            return 400, json.dumps({"error": str(ex)}), _CTYPES["json"]
        except Exception as ex:  # pragma: no cover - defensive
            return (
                500,
                json.dumps({"error": f"{type(ex).__name__}: {ex}"}),
                _CTYPES["json"],
            )

    def _make_handler(self):
        svc = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(
                self, code: int, body: str | dict,
                ctype: str = _CTYPES["json"],
            ) -> None:
                if isinstance(body, dict):  # error payloads
                    body = json.dumps(body)
                data = body.encode()
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path != "/sparql":
                    return self._reply(404, {"error": "use /sparql"})
                q = parse_qs(u.query).get("query", [None])[0]
                if not q:
                    return self._reply(400, {"error": "missing query param"})
                self._reply(*svc._handle(q, self.headers.get("Accept")))

            def do_POST(self):
                u = urlparse(self.path)
                if u.path not in ("/sparql", "/update"):
                    return self._reply(404, {"error": "use /sparql or /update"})
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n).decode()
                ctype = (self.headers.get("Content-Type") or "").split(";")[0]
                if u.path == "/update" or ctype == "application/sparql-update":
                    if ctype in ("application/sparql-update",):
                        up = body
                    else:  # form-encoded per SPARQL protocol §2.2.2
                        up = parse_qs(body).get("update", [None])[0]
                    if not up:
                        return self._reply(400, {"error": "missing update"})
                    return self._reply(*svc._handle_update(up))
                if ctype == "application/sparql-query":
                    q = body
                else:  # form-encoded per SPARQL protocol
                    q = parse_qs(body).get("query", [None])[0]
                    if q is None:
                        # form posts may carry update= to the query path
                        up = parse_qs(body).get("update", [None])[0]
                        if up:
                            return self._reply(*svc._handle_update(up))
                if not q:
                    return self._reply(400, {"error": "missing query"})
                self._reply(*svc._handle(q, self.headers.get("Accept")))

        return Handler

    # -- lifecycle -------------------------------------------------------
    def start(self) -> int:
        """Start serving in a daemon thread; returns the bound port
        (pass port=0 to pick a free one)."""
        self._httpd = ThreadingHTTPServer(
            (self.host, self.port), self._make_handler()
        )
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
