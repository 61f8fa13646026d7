"""Operational support surfaces from the reference (SURVEY.md §2A
A15/A16/A17): error notification, config validation, and path
expansion — driver-side concerns, restated without the reference's
shell-out and hardcoded-path defects.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field

# The reference's required-config guard (Unity_to_BigQuery.py:24-29)
REQUIRED_CONFIG_KEYS = (
    "postgres_username",
    "postgres_pass",
    "postgres_host",
    "unity_project_id",
    "local_collection_path",
)


class ConfigError(ValueError):
    pass


def load_config(path: str, required: tuple[str, ...] = REQUIRED_CONFIG_KEYS) -> dict:
    """A16/A17: parse + validate the JSON config and expand user paths.
    Unlike the reference (hardcoded path at Unity_to_BigQuery.py:194,
    falsy-check that conflates missing and empty), missing keys are
    reported by name.
    """
    with open(os.path.expanduser(path)) as fh:
        cfg = json.load(fh)
    missing = [k for k in required if not cfg.get(k)]
    if missing:
        raise ConfigError(f"config missing/empty keys: {missing}")
    if "local_collection_path" in cfg:
        cfg["local_collection_path"] = os.path.expanduser(cfg["local_collection_path"])
    return cfg


@dataclass
class ErrorNotifier:
    """A15: error-notification hook (the reference shells out curl to a
    Slack webhook, slack_notifier.py:5-11 — an injection-prone
    os.system call). Here: a pluggable callback; the default collects
    messages so tests and retries can observe them. A production sink
    posts JSON via an HTTP client, never a shell.
    """

    channel: str = "#analytics_feed"
    sink: Callable[[str, str], None] | None = None
    sent: list[tuple[str, str]] = field(default_factory=list)

    def notify(self, error: str) -> None:
        self.sent.append((self.channel, error))
        if self.sink is not None:
            self.sink(self.channel, error)


def webhook_sink(
    webhook_url: str, post: Callable[..., object] | None = None
) -> Callable[[str, str], None]:
    """A15 default sink: POST the reference's exact payload shape
    ``{"text": <message>}`` (slack_notifier.py:10) to a webhook URL —
    as an HTTP client call with JSON encoding, not the reference's
    ``os.system("curl --data '" + message + "'")`` (slack_notifier.py:11),
    which both breaks and injects on quotes in the message. ``post`` is
    injectable for tests; default is requests.post.

    Usage: ``ErrorNotifier(sink=webhook_sink(url))``.
    """
    if post is None:
        import requests

        post = requests.post

    def _send(channel: str, error: str) -> None:
        post(
            webhook_url,
            json={"text": error},
            headers={"Content-type": "application/json"},
            timeout=10.0,
        )

    return _send


def run_with_notification(notifier: ErrorNotifier, fn: Callable, *args, **kwargs):
    """The reference's outer try/except→Slack shape
    (Unity_to_BigQuery.py:213-215): per-job failures notify and
    re-raise; callers decide whether the run continues (the reference
    continued accidentally via TypeError — here it is explicit).
    """
    try:
        return fn(*args, **kwargs)
    except Exception as exc:
        notifier.notify(f"{type(exc).__name__}: {exc}")
        raise


def observe_quality(df, name: str = "qc", **metrics):
    """Attach one-pass data-quality counters to a DataFrame via the
    Observation API: the metrics ride along with whatever action the
    caller runs — NO second scan, which at 100 TB is the difference
    between free telemetry and doubling the job. Returns
    (instrumented_df, observation); read observation.get AFTER an
    action.

    Default metrics when none given: row count. Usage:
        df2, obs = observe_quality(df, nulls=F.sum(F.col("v").isNull().cast("long")))
        df2.write.parquet(...); stats = obs.get
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    if not metrics:
        metrics = {"rows": F.count(F.lit(1))}
    obs = Observation(name)
    cols = [c.alias(alias) for alias, c in metrics.items()]
    return df.observe(obs, *cols), obs


def streaming_error_listener(spark, notifier: ErrorNotifier):
    """A15 for the streaming plane: a StreamingQueryListener that routes
    query-terminated-with-exception events into the ErrorNotifier —
    the engine-managed replacement for wrapping every poll-loop
    iteration in try/except (Unity_to_BigQuery.py:196-198,213-215).
    Returns the listener (caller may removeListener when done).
    """
    from pyspark.sql.streaming import StreamingQueryListener

    class _Listener(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            if event.exception is not None:
                notifier.notify(f"streaming query {event.id} failed: {event.exception}")

    listener = _Listener()
    spark.streams.addListener(listener)
    return listener


def plan_backfill_windows(start_date, end_date, max_days: int = 30):
    """Split a historical backfill range into export-sized windows.

    The reference's export API caps history at 30 days and the script
    simply requests ``today - timedelta(days=30)`` once, silently
    dropping anything older (Unity_to_BigQuery.py:157, README.md:20).
    A correct backfill instead walks the full range in ``max_days``
    chunks, oldest first, each window feeding one export request whose
    completion is checkpointed (A11/A12) before the next — so a crash
    resumes at the first un-checkpointed window, never re-exporting or
    skipping history.

    Returns a list of (window_start, window_end) date pairs, end
    exclusive, covering [start_date, end_date) exactly with no overlap;
    empty when start >= end. Driver-side metadata planning (a dozen
    tuples), not a data-plane operator.
    """
    from datetime import timedelta

    if max_days < 1:
        raise ValueError("max_days must be >= 1")
    windows = []
    cur = start_date
    step = timedelta(days=max_days)
    while cur < end_date:
        nxt = min(cur + step, end_date)
        windows.append((cur, nxt))
        cur = nxt
    return windows
