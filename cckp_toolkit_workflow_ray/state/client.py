"""Stateful external-client actor stage (SURVEY.md §2 A3).

The reference holds ONE authenticated agent session across every record it
processes (``/root/reference/bin/analyze.py:24-28``: the Synapse agent
session is created once and reused by each ``analyze_repo`` call).  The
Ray-Data-native analog is an actor-pool ``map_batches`` stage: the client
logs in once per actor in ``__init__`` and every batch reuses the live
session — never a login per batch or per row.

The sandbox has no network, so the default client is a deterministic fake
with the surface a real client would have (``login() -> token``,
``request(payload) -> response``); production swaps in a real client via
``client_factory`` without touching the stage.
"""

from __future__ import annotations

import itertools

import pyarrow as pa

# process-local login counter: lets tests (and the responses themselves)
# prove how many logins each worker process performed
_LOGIN_SEQ = itertools.count(1)


class FakeExternalClient:
    """Deterministic stand-in for an authenticated external service."""

    def __init__(self):
        self.session: str | None = None
        self.n_logins = 0
        self.n_requests = 0

    def login(self) -> str:
        self.n_logins += 1
        self.session = f"session-{next(_LOGIN_SEQ)}"
        return self.session

    def request(self, payload: str) -> str:
        if self.session is None:
            raise RuntimeError("request() before login()")
        self.n_requests += 1
        return f"{self.session}/r{self.n_requests}:len={len(payload or '')}"


class ExternalClientStage:
    """Actor-pool stage: login once per actor, reuse across batches.

    Pass the CLASS to ``map_batches(ExternalClientStage, concurrency=N,
    fn_constructor_kwargs=...)``; each actor pays the login exactly once.
    """

    def __init__(self, client_factory=None, text_col: str = "text",
                 out_col: str = "response"):
        self.client = (client_factory or FakeExternalClient)()
        self.client.login()                      # ONCE per actor
        self.text_col = text_col
        self.out_col = out_col
        self.n_batches = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.n_batches += 1
        texts = batch.column(self.text_col).to_numpy(zero_copy_only=False)
        out = [self.client.request(x) for x in texts]
        return batch.append_column(self.out_col, pa.array(out, type=pa.string()))


def enrich_with_client(ds, client_factory=None, text_col: str = "text",
                       out_col: str = "response", concurrency=(1, 4),
                       batch_size: int = 4096):
    """Run every row through the (actor-held) external client session."""
    return ds.map_batches(
        ExternalClientStage,
        fn_constructor_kwargs={"client_factory": client_factory,
                               "text_col": text_col, "out_col": out_col},
        batch_format="pyarrow", concurrency=concurrency, batch_size=batch_size,
    )


def make_client_summarizer(client_factory=None):
    """A ``write_html_report`` summarizer hook backed by a held client
    session (the analyze.py report-agent analog): login happens once at
    construction, every report call reuses the session."""
    client = (client_factory or FakeExternalClient)()
    client.login()

    def summarize(report: dict) -> str:
        return client.request(
            f"rows={report.get('n_rows')} violations={report.get('n_violations')}")

    return summarize
