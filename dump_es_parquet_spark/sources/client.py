"""ES/OpenSearch client abstraction + in-process mock.

The reference talks to a live cluster through ``opensearch-py``
(``dump-es-parquet:71-83``). This engine defines a minimal client
protocol covering exactly the five server interactions the reference
uses — settings (index enumeration), mapping, search-with-scroll,
scroll-continue, plus (engine extension) ``search_after`` pagination —
and ships two implementations:

- ``MockES``: fixture-driven, picklable, used by the test-suite (the
  reference has no tests; SURVEY.md §5 calls for mocked-ES e2e tests).
  Supports *sliced* scans so the parallel scan path is exercised.
- ``RestES``: stdlib-``urllib`` JSON-over-HTTP client for real
  clusters (TLS options mirror reference ``:372-375``). Untested
  against a live server in this environment; kept thin.

Retry semantics: the reference retries forever with a flat 10 s sleep
on ``TransportError`` (``:189-194, 227-232, 296-299``). ``with_retry``
reproduces that as the default (``max_retries=None``) but lets callers
bound it — inside Spark tasks a *bounded* retry composes with Spark's
own task retry (``spark.task.maxFailures``), which is the scale-correct
design (SURVEY.md §4).
"""

from __future__ import annotations

import fnmatch
import itertools
import json
import time
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable


class TransportError(Exception):
    """Transient server/transport failure (named after the
    opensearch-py exception the reference catches)."""


def with_retry(
    fn: Callable[[], Any],
    *,
    max_retries: int | None = None,
    backoff_s: float = 10.0,
    sleep: Callable[[float], None] = time.sleep,
) -> Any:
    """Run ``fn`` retrying on TransportError.

    ``max_retries=None`` → retry forever (reference behavior,
    ``dump-es-parquet:189-194``); otherwise raise after N retries.
    """
    attempt = 0
    while True:
        try:
            return fn()
        except TransportError:
            attempt += 1
            if max_retries is not None and attempt > max_retries:
                raise
            sleep(backoff_s)


# ---------------------------------------------------------------------------
# mock
# ---------------------------------------------------------------------------


def _get_path(doc: dict, path: str):
    cur: Any = doc
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def _match_query_string(doc: dict, q: str | None) -> bool:
    """Tiny Lucene-ish evaluator for tests: supports ``field:value``,
    ``field:[lo TO hi]`` and ``AND`` conjunctions. The reference passes
    the query string verbatim to the server (``:222``) — a full Lucene
    parser is the server's job, not the client's; this subset only
    exists so pushdown plumbing is testable."""
    if not q:
        return True
    for clause in q.split(" AND "):
        fld, _, val = clause.partition(":")
        fld, val = fld.strip(), val.strip()
        got = _get_path(doc, fld)
        if val.startswith("[") and " TO " in val:
            lo, hi = val.strip("[]").split(" TO ")
            if got is None:
                return False
            g = str(got)
            try:
                gf, lof, hif = float(got), float(lo), float(hi)
                if not (lof <= gf <= hif):
                    return False
            except (TypeError, ValueError):
                if not (lo <= g <= hi):
                    return False
        else:
            if got is None or str(got) != val:
                return False
    return True


def _project(doc: dict, includes: list[str] | None) -> dict:
    if not includes:
        return doc
    out = {}
    for k, v in doc.items():
        if any(fnmatch.fnmatch(k, pat) for pat in includes):
            out[k] = v
    return out


@dataclass
class MockES:
    """In-process ES/OS stand-in.

    ``fixture``: ``{index_name: {"mapping": <properties dict>,
    "docs": [<_source dict>, ...]}}``. Picklable → usable inside Spark
    tasks. ``fail_first``: raise TransportError for the first N calls
    (retry-path testing).
    """

    fixture: dict[str, dict]
    fail_first: int = 0
    _calls: itertools.count = field(default_factory=itertools.count, repr=False)
    _scrolls: dict = field(default_factory=dict, repr=False)

    def _maybe_fail(self):
        if next(self._calls) < self.fail_first:
            raise TransportError("simulated transport failure")

    # -- catalog ------------------------------------------------------
    def get_settings(self, index: str) -> dict:
        """Pattern → {index: settings} (reference get_indices,
        dump-es-parquet:341-350)."""
        self._maybe_fail()
        names = fnmatch.filter(sorted(self.fixture), index)
        return {n: {"settings": {}} for n in names}

    def get_mapping(self, index: str) -> dict:
        self._maybe_fail()
        props = self.fixture[index]["mapping"]
        return {index: {"mappings": {"properties": props}}}

    # -- scan ---------------------------------------------------------
    def _docs_for(self, index, q, slice_spec) -> list[dict]:
        docs = [d for d in self.fixture[index]["docs"] if _match_query_string(d, q)]
        if slice_spec:
            i, n = slice_spec["id"], slice_spec["max"]
            docs = docs[i::n]
        return docs

    @staticmethod
    def _sort_docs(docs: list[dict], sort: str | None) -> list[dict]:
        if not sort:
            return docs
        for part in reversed(sort.split(",")):
            fld, _, direction = part.partition(":")
            docs = sorted(
                docs,
                key=lambda d: (_get_path(d, fld) is None, _get_path(d, fld)),
                reverse=direction.strip() == "desc",
            )
        return docs

    def search(
        self,
        index: str,
        q: str | None = None,
        _source: list[str] | None = None,
        sort: str | None = None,
        size: int = 500,
        scroll: str | None = "1h",
        slice_spec: dict | None = None,
        search_after: list | None = None,
    ) -> dict:
        self._maybe_fail()
        docs = self._sort_docs(self._docs_for(index, q, slice_spec), sort)
        hits = [
            {"_id": str(i), "_index": index, "_source": _project(d, _source)}
            for i, d in enumerate(docs)
        ]
        if search_after is not None:
            # cursor = [offset] — a real server uses sort values + _id;
            # offset is equivalent for a frozen mock corpus
            hits = hits[int(search_after[0]) :]
        total = len(hits)
        page, rest = hits[:size], hits[size:]
        resp = {"hits": {"total": {"value": total}, "hits": page}}
        if scroll:
            sid = f"scroll-{index}-{id(rest)}-{len(rest)}"
            self._scrolls[sid] = (rest, size)
            resp["_scroll_id"] = sid
        if page and search_after is not None:
            resp["last_sort"] = [int(search_after[0]) + len(page)]
        return resp

    def scroll(self, scroll_id: str, scroll: str = "1h") -> dict:
        self._maybe_fail()
        rest, size = self._scrolls.get(scroll_id, ([], 500))
        page, rest = rest[:size], rest[size:]
        self._scrolls[scroll_id] = (rest, size)
        return {"_scroll_id": scroll_id, "hits": {"hits": page}}


# ---------------------------------------------------------------------------
# REST (stdlib-only; for real clusters)
# ---------------------------------------------------------------------------


@dataclass
class RestES:
    """Minimal JSON-over-HTTP(S) client (no external deps).

    TLS/client-cert options mirror the reference ctor
    (``dump-es-parquet:71-83``): ``cert``/``key`` for mutual TLS,
    ``capath`` for a CA bundle, ``verify_certs=False`` to disable
    verification. Only the endpoints the engine uses are implemented.
    """

    base_url: str
    timeout: int = 60
    cert: str | None = None
    key: str | None = None
    capath: str | None = None
    verify_certs: bool = True

    def _ssl_context(self):
        import ssl

        if not self.base_url.startswith("https"):
            return None
        ctx = ssl.create_default_context(cafile=self.capath)
        if self.cert:
            ctx.load_cert_chain(self.cert, self.key)
        if not self.verify_certs:
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
        return ctx

    def _req(self, method: str, path: str, body: dict | None = None) -> dict:
        url = self.base_url.rstrip("/") + path
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            url, data=data, method=method, headers={"Content-Type": "application/json"}
        )
        try:
            with urllib.request.urlopen(
                req, timeout=self.timeout, context=self._ssl_context()
            ) as resp:
                return json.loads(resp.read())
        except OSError as e:  # connection-level failures → retryable
            raise TransportError(str(e)) from e

    def get_settings(self, index: str) -> dict:
        return self._req("GET", f"/{index}/_settings")

    def get_mapping(self, index: str) -> dict:
        return self._req("GET", f"/{index}/_mapping")

    def search(
        self,
        index: str,
        q: str | None = None,
        _source: list[str] | None = None,
        sort: str | None = None,
        size: int = 500,
        scroll: str | None = "1h",
        slice_spec: dict | None = None,
        search_after: list | None = None,
    ) -> dict:
        params = [f"size={size}"]
        if scroll:
            params.append(f"scroll={scroll}")
        if q:
            params.append("q=" + urllib.parse.quote(q))
        if sort:
            params.append("sort=" + urllib.parse.quote(sort))
        body: dict[str, Any] = {}
        if _source:
            body["_source"] = _source
        if slice_spec:
            body["slice"] = slice_spec
        if search_after is not None:
            body["search_after"] = search_after
        resp = self._req("POST", f"/{index}/_search?" + "&".join(params), body or None)
        hits = resp.get("hits", {}).get("hits", [])
        if hits and "sort" in hits[-1]:
            resp["last_sort"] = hits[-1]["sort"]
        return resp

    def scroll(self, scroll_id: str, scroll: str = "1h") -> dict:
        return self._req(
            "POST", "/_search/scroll", {"scroll": scroll, "scroll_id": scroll_id}
        )


def iter_hits_search_after(
    client,
    index: str,
    *,
    q: str | None,
    _source: list[str] | None,
    sort: str | None,
    size: int,
    slice_spec: dict | None = None,
    max_retries: int | None = 3,
    backoff_s: float = 1.0,
) -> Iterable[dict]:
    """``search_after`` pagination loop — the retry-idempotent cursor
    (SURVEY.md §7 hard part 2): unlike a scroll id, the sort-key cursor
    is *resumable*, so a retried page re-requests exactly where the
    last successful page ended instead of consuming a one-shot
    server-side cursor. Pair with a PIT id in production for snapshot
    isolation; the pagination mechanics are identical."""
    cursor: list | None = [0]  # first page: offset-style cursor start
    while True:
        after = None if cursor == [0] else cursor
        resp = with_retry(
            lambda: client.search(
                index,
                q=q,
                _source=_source,
                sort=sort,
                size=size,
                scroll=None,  # no server-held cursor
                slice_spec=slice_spec,
                search_after=after if after is not None else [0],
            ),
            max_retries=max_retries,
            backoff_s=backoff_s,
        )
        hits = resp["hits"]["hits"]
        if not hits:
            return
        yield from hits
        cursor = resp.get("last_sort")
        if cursor is None:
            return


def iter_hits(
    client,
    index: str,
    *,
    q: str | None,
    _source: list[str] | None,
    sort: str | None,
    size: int,
    scroll: str,
    slice_spec: dict | None = None,
    max_retries: int | None = 3,
    backoff_s: float = 1.0,
) -> Iterable[dict]:
    """Scroll loop for one slice: initial search + scroll-until-empty
    (reference ``:219-302``), yielding raw hit dicts."""
    resp = with_retry(
        lambda: client.search(
            index,
            q=q,
            _source=_source,
            sort=sort,
            size=size,
            scroll=scroll,
            slice_spec=slice_spec,
        ),
        max_retries=max_retries,
        backoff_s=backoff_s,
    )
    total = resp["hits"]["total"]
    total = total["value"] if isinstance(total, dict) else total  # ES7 vs 6 (:233-235)
    if not total:
        return
    while True:
        hits = resp["hits"]["hits"]
        if not hits:
            return
        yield from hits
        sid = resp.get("_scroll_id")
        if sid is None:
            return
        resp = with_retry(
            lambda: client.scroll(sid, scroll),
            max_retries=max_retries,
            backoff_s=backoff_s,
        )
