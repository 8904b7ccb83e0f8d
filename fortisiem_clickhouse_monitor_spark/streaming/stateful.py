"""Custom stateful streaming operator (SURVEY §2.10 extension):
per-user sessionization with `applyInPandasWithState` — the escape
hatch for stateful semantics the built-in windows can't express
(per-key custom merge logic, custom emission policy, arbitrary state).

Semantics match `F.session_window(ts, gap)` + count/sum (so the
built-in batch form is the differential oracle, see
tests/test_stateful.py): a session is a maximal run of a user's events
with inter-event gaps <= GAP; session_end = last event + GAP.

State design (the part that must survive 100 TB):
- state per user is O(1): (start, last, n, total) — no event buffering;
- closed sessions emit as soon as a newer event proves the gap, so
  output is append-mode and early;
- still-open sessions close via EVENT-TIME TIMEOUT when the watermark
  passes last + GAP: state cannot outlive the watermark horizon, so
  total state is bounded by (#active users within horizon) x 32 bytes.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

SESSION_GAP_SECONDS = 1800  # 30 min, matching stream_session_windows

OUTPUT_SCHEMA = (
    "user_id LONG, session_start TIMESTAMP, session_end TIMESTAMP,"
    " n_events LONG, total_value DOUBLE"
)
#: (start_us, last_us, n, total) — epoch microseconds.
STATE_SCHEMA = "start LONG, last LONG, n LONG, total DOUBLE"


def _emit(user_id: int, start_us: int, last_us: int, n: int, total: float) -> pd.DataFrame:
    gap_us = SESSION_GAP_SECONDS * 1_000_000
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us + gap_us, unit="us")],
            "n_events": [n],
            "total_value": [total],
        }
    )


def sessionize_fn(key, pdf_iter: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    gap_us = SESSION_GAP_SECONDS * 1_000_000

    if state.hasTimedOut:
        start_us, last_us, n, total = state.get
        state.remove()
        yield _emit(user_id, start_us, last_us, n, total)
        return

    cur = list(state.get) if state.exists else None
    batch = pd.concat(list(pdf_iter))
    batch = batch.sort_values("ts")
    # normalize to ns first (pandas may deliver datetime64[us] or [ns])
    ts_us = batch["ts"].astype("datetime64[ns]").astype("int64") // 1_000
    for t, v in zip(ts_us, batch["value"]):
        t = int(t)
        if cur is None:
            cur = [t, t, 1, float(v)]
        elif t - cur[1] > gap_us:
            yield _emit(user_id, *cur)
            cur = [t, t, 1, float(v)]
        else:
            cur[1] = max(cur[1], t)
            cur[2] += 1
            cur[3] += float(v)

    state.update(tuple(cur))
    # Close via timeout when the watermark passes last + gap. If the
    # watermark already passed it (late data beyond the horizon), the
    # earliest legal timeout is watermark+1 — the session closes on the
    # next batch instead of erroring (best-effort late handling).
    timeout_ms = (cur[1] + gap_us) // 1_000
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))


def sessionize(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked custom sessionizer over an events-shaped stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize_fn,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Integer EWMA: O(1)-state streaming twin of operators.behavior.ewma_user_value
# ---------------------------------------------------------------------------

EWMA_SHIFT = 2_000_000
EWMA_OUTPUT_SCHEMA = "user_id LONG, n_events LONG, ewma_scaled LONG"
#: (e, n) — shifted integer EWMA state and event count.
EWMA_STATE_SCHEMA = "e LONG, n LONG"


def ewma_fn(key, pdf_iter: "Iterator[pd.DataFrame]", state) -> "Iterator[pd.DataFrame]":
    """Per-key integer EWMA fold (alpha = 1/2) over (ts, event_id)-
    ordered batch rows. State is TWO ints per key — the property that
    lets this run over unbounded streams where the batch twin's
    collected array cannot. The recurrence operates on values shifted
    into the positive domain so Python floor division, Spark `div`,
    and DuckDB `//` agree (they differ on negatives)."""
    (user_id,) = key
    e, n = (list(state.get) if state.exists else (None, 0))
    batch = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
    import math

    for v in batch["value"]:
        q = int(math.floor(float(v) * 100)) + EWMA_SHIFT
        e = q if e is None else (e + q) // 2  # positive ints: floor == trunc
        n += 1
    state.update((e, n))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "ewma_scaled": [e - EWMA_SHIFT]}
    )


def ewma(stream: DataFrame) -> DataFrame:
    """Streaming integer EWMA per user; emits the running state each
    batch (take the row with max n_events per user for the final
    value). No watermark/timeout: state is O(1) per key by design."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        ewma_fn,
        EWMA_OUTPUT_SCHEMA,
        EWMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Fixed-window alert throttle: the TRUE suppression semantics
# ---------------------------------------------------------------------------

THROTTLE_WINDOW_SECONDS = 600  # matches alert_suppression_window's gap

THROTTLE_OUTPUT_SCHEMA = (
    "user_id LONG, alert_event_id LONG, page_ts TIMESTAMP,"
    " window_end TIMESTAMP, n_suppressed LONG"
)
#: (win_start_us, first_event_id, n_suppressed) per user.
THROTTLE_STATE_SCHEMA = "start LONG, eid LONG, n LONG"


def _page(user_id: int, start_us: int, eid: int, n: int) -> pd.DataFrame:
    win_us = THROTTLE_WINDOW_SECONDS * 1_000_000
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "alert_event_id": [eid],
            "page_ts": [pd.Timestamp(start_us, unit="us")],
            "window_end": [pd.Timestamp(start_us + win_us, unit="us")],
            "n_suppressed": [n],
        }
    )


def throttle_fn(key, pdf_iter: "Iterator[pd.DataFrame]", state) -> "Iterator[pd.DataFrame]":
    """Fixed-window-from-first-page alert throttle: the first error
    opens a window anchored at ITS OWN timestamp; every error within
    [start, start + W] is suppressed REGARDLESS of inter-event gaps,
    and the first error after the window opens the next one.  This is
    the semantics the batch operator (alert_suppression_window)
    documents as requiring recursive state — a lag-gap island restarts
    the clock on every error, this does not.  State is 3 ints per key;
    a page row emits when its window is PROVEN over (a later error
    falls past it, or the event-time timeout passes start + W).

    Late-event contract (within the watermark, across micro-batches):
    an event whose ts sorts BEFORE the open window's start is
    attributed to the OPEN window's suppression count — its true
    window has already been finalized and emitted, so re-anchoring or
    retro-incrementing is impossible in append mode; the watermark
    bounds how stale such a straggler can be.  If no window is open
    (the prior one just timed out), a late event anchors a fresh
    window at its own past timestamp, whose timeout then fires no
    earlier than watermark + 1 ms — it closes promptly instead of
    lingering.  Tested by test_stateful_throttle_late_cross_batch."""
    win_us = THROTTLE_WINDOW_SECONDS * 1_000_000
    (user_id,) = key

    if state.hasTimedOut:
        start_us, eid, n = state.get
        state.remove()
        yield _page(user_id, start_us, eid, n)
        return

    cur = list(state.get) if state.exists else None
    batch = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
    ts_us = batch["ts"].astype("datetime64[ns]").astype("int64") // 1_000
    for t, eid in zip(ts_us, batch["event_id"]):
        t, eid = int(t), int(eid)
        if cur is None:
            cur = [t, eid, 0]
        elif t - cur[0] <= win_us:
            cur[2] += 1
        else:
            yield _page(user_id, *cur)
            cur = [t, eid, 0]
    state.update(tuple(cur))
    timeout_ms = (cur[0] + win_us) // 1_000
    wm_ms = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(timeout_ms, wm_ms + 1))


def throttle(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked alert throttle over an events-shaped stream (caller
    filters to the alerting event type)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            throttle_fn,
            THROTTLE_OUTPUT_SCHEMA,
            THROTTLE_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM: daily level-shift detection with O(1) per-key state
# ---------------------------------------------------------------------------

CUSUM_OUTPUT_SCHEMA = (
    "event_type STRING, day DATE, n LONG, cusum2 LONG, is_shift BOOLEAN"
)
#: (open epoch day, count so far, prefix sum p2 over CLOSED days,
#:  running min of p2 over closed days; _CUSUM_NO_MIN = none yet;
#:  day = _CUSUM_NO_DAY = no open day, carry only).
CUSUM_STATE_SCHEMA = "day LONG, n LONG, p2 LONG, minp2 LONG"

_CUSUM_NO_MIN = 2**62
_CUSUM_NO_DAY = -(2**62)
#: 9999-12-31T23:59:59Z in epoch ms — "never" for a carry-only state's
#: re-armed timeout (an event re-arms the real end-of-day timeout).
_CUSUM_FAR_FUTURE_MS = 253_402_300_799_000


def make_cusum_fn(targets: dict):
    """Build the per-event-type CUSUM fold for applyInPandasWithState.

    ``targets`` maps event_type -> med2 (DOUBLED daily target, exact
    .5-safe integers) — in production the target comes from the
    previous batch window's median (the same prior-state discipline as
    incremental CC label maintenance); the batch twin
    (changepoint_cusum_daily) derives it from the full data, so a
    differential test feeds the batch medians in here and the outputs
    must match row-for-row.

    State is FOUR ints per key regardless of stream length: the open
    day, its count, the prefix sum P over closed days, and min_j P_j.
    A day emits when PROVEN over — a later-day event arrives, or the
    event-time timeout passes end-of-day.  A timeout close keeps the
    (p2, minp2) carry under a no-open-day marker (four ints, not
    removed): the watermark is GLOBAL, so one quiet event_type would
    otherwise have its prefix sums wiped while other types advance the
    clock, restarting its detector at p2=0 and diverging from the
    batch twin.  Within-watermark stragglers whose ts sorts
    into an already-closed day are counted toward the OPEN day (same
    documented contract as throttle_fn; closed days are final in
    append mode)."""
    win_us_day = 86_400 * 1_000_000

    def _close(etype, cur, med2):
        day, n, p2, minp2 = cur
        p2 = p2 + 2 * n - med2
        minp2 = p2 if minp2 == _CUSUM_NO_MIN else min(minp2, p2)
        cusum2 = p2 - min(minp2, 0)
        row = pd.DataFrame(
            {
                "event_type": [etype],
                "day": [pd.Timestamp(day * win_us_day, unit="us").date()],
                "n": [n],
                "cusum2": [cusum2],
                "is_shift": [cusum2 >= 2 * med2],
            }
        )
        return row, p2, minp2

    def cusum_fn(key, pdf_iter, state):
        (etype,) = key
        med2 = int(targets.get(etype, 0))

        if state.hasTimedOut:
            # Close the open day but KEEP the prefix sums: the
            # watermark is global, so a quiet day for one event_type
            # (while other types keep advancing it) times out here —
            # state.remove() would restart the detector at p2=0 on the
            # next event, diverging from the batch twin.  A no-open-day
            # marker with the (p2, minp2) carry resumes the recursion
            # exactly where the batch CUSUM would.  The expired timeout
            # timestamp survives an update() (GroupState keeps it
            # unless re-set), so push it out to the far future or the
            # carry state would "time out" again every microbatch and
            # close phantom days (n=0 closes shift p2 by -med2 each).
            cur = list(state.get)
            if cur[0] != _CUSUM_NO_DAY:
                row, p2, minp2 = _close(etype, cur, med2)
                state.update((_CUSUM_NO_DAY, 0, p2, minp2))
                state.setTimeoutTimestamp(_CUSUM_FAR_FUTURE_MS)
                yield row
            return

        cur = list(state.get) if state.exists else None
        batch = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        days = (
            batch["ts"].astype("datetime64[ns]").astype("int64")
            // (86_400 * 1_000_000_000)
        )
        for d in days:
            d = int(d)
            if cur is None:
                cur = [d, 0, 0, _CUSUM_NO_MIN]
            elif cur[0] == _CUSUM_NO_DAY:
                # carry-only state left by a timeout close: reopen on
                # this event's day, resuming with the kept (p2, minp2).
                cur = [d, 0, cur[2], cur[3]]
            elif d > cur[0]:
                row, p2, minp2 = _close(etype, cur, med2)
                yield row
                cur = [d, 0, p2, minp2]
            cur[1] += 1
        state.update(tuple(cur))
        timeout_ms = (cur[0] + 1) * 86_400 * 1_000
        state.setTimeoutTimestamp(
            max(timeout_ms, state.getCurrentWatermarkMs() + 1)
        )

    return cusum_fn


def cusum(
    stream: DataFrame, targets: dict, watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked streaming CUSUM over an events-shaped stream: the
    continuously-evaluated form of changepoint_cusum_daily with the
    per-type target supplied as prior-window state."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            make_cusum_fn(targets),
            CUSUM_OUTPUT_SCHEMA,
            CUSUM_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Continuous heavy hitters: sharded Misra-Gries over the user stream
# ---------------------------------------------------------------------------

MG_K = 8        # counters retained per shard
MG_SHARDS = 8   # user_id % MG_SHARDS keys the state

MG_OUTPUT_SCHEMA = (
    "shard LONG, processed LONG, user_id LONG, est_count LONG"
)
MG_STATE_SCHEMA = "items ARRAY<LONG>, counts ARRAY<LONG>, processed LONG"


def _mg_merge(state: dict, batch: dict, k: int) -> dict:
    """Misra-Gries MERGE (Agarwal et al., "Mergeable Summaries"):
    add the two counter maps, subtract the (k+1)-th largest count from
    every entry, drop non-positives — the summary keeps the MG error
    bound sum_decrements <= n/(k+1) under arbitrary merging, which is
    what makes per-shard sketches recombinable at read time."""
    combined = dict(state)
    for it, c in batch.items():
        combined[it] = combined.get(it, 0) + c
    if len(combined) > k:
        cut = sorted(combined.values(), reverse=True)[k]
        combined = {
            it: c - cut for it, c in combined.items() if c - cut > 0
        }
    return combined


def mg_fn(key, pdf_iter: "Iterator[pd.DataFrame]", state) -> Iterator[pd.DataFrame]:
    """Per-shard fold: merge each micro-batch's exact (user -> count)
    into the O(k) counter state, then emit the CURRENT sketch snapshot
    (one row per retained counter, tagged with rows processed so far —
    a monitor keeps the latest snapshot per shard).  State is O(k)
    longs regardless of stream length; no per-event state ever
    exists."""
    (shard,) = key
    if state.exists:
        items, counts, processed = state.get
        cur = dict(zip(items, counts))
    else:
        cur, processed = {}, 0
    for pdf in pdf_iter:
        vc = pdf["user_id"].value_counts()
        processed += int(vc.sum())
        cur = _mg_merge(cur, {int(u): int(c) for u, c in vc.items()}, MG_K)
    state.update((list(cur), [cur[i] for i in cur], processed))
    snap = sorted(cur.items(), key=lambda kv: (-kv[1], kv[0]))
    yield pd.DataFrame(
        {
            "shard": [shard] * len(snap),
            "processed": [processed] * len(snap),
            "user_id": [u for u, _ in snap],
            "est_count": [c for _, c in snap],
        }
    )


def heavy_hitters(stream: DataFrame) -> DataFrame:
    """Continuous top-talker monitor: sharded Misra-Gries counters over
    the event stream's user ids — the streaming twin of
    sketch_heavy_hitter_tokens.  Sharding by ``user_id % {MG_SHARDS}``
    keeps state distributed (one O(k) summary per shard, no global
    single-key bottleneck); the per-shard summaries are MERGEABLE, so
    the reader recombines them with the same _mg_merge to a global
    top-k whose error bound n/(k+1) survives the merge — the textbook
    reason Misra-Gries (and not a plain hash count) is the 100 TB
    shape.  Emits a snapshot per shard per micro-batch; a monitoring
    sink keeps the latest (max processed) per shard."""
    from pyspark.sql import functions as F

    return (
        stream.select(
            (F.col("user_id") % MG_SHARDS).alias("shard"), "user_id"
        )
        .groupBy("shard")
        .applyInPandasWithState(
            mg_fn,
            outputStructType=MG_OUTPUT_SCHEMA,
            stateStructType=MG_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


# ---------------------------------------------------------------------------
# Continuous cumulative-distinct-users: per-user first-seen state
# ---------------------------------------------------------------------------

FS_OUTPUT_SCHEMA = "user_id LONG, first_day DATE"
FS_STATE_SCHEMA = "seen LONG"


def first_seen_fn(
    key, pdf_iter: "Iterator[pd.DataFrame]", state
) -> Iterator[pd.DataFrame]:
    """Emit (user, first day) exactly ONCE — on the micro-batch where
    the user is first observed; afterwards the 8-byte seen flag
    swallows every later event.  State is one long per distinct user
    ever seen (the minimum any exact first-seen operator can hold);
    emission is append-mode and immediate."""
    (user_id,) = key
    if state.exists:
        for _ in pdf_iter:
            pass
        yield pd.DataFrame({"user_id": [], "first_day": []})
        return
    first = None
    for pdf in pdf_iter:
        lo = pdf["ts"].min()
        first = lo if first is None or lo < first else first
    state.update((1,))
    yield pd.DataFrame(
        {"user_id": [user_id], "first_day": [first.date()]}
    )


def first_seen(stream: DataFrame) -> DataFrame:
    """Streaming twin of window_cumulative_distinct_users' key move:
    the cumulative-distinct curve increments exactly at each user's
    FIRST event, so the stream reduces to per-user first-seen emission
    (this operator) + a downstream per-day count + running sum on the
    tiny daily frame.  NOTE the within-batch caveat: first_day is the
    min event time of the user's FIRST MICRO-BATCH — exact when the
    source preserves event-time order across batches (the replay
    harness does), and at worst one batch's skew otherwise; the exact
    batch form is the oracle in the differential test."""
    return stream.groupBy("user_id").applyInPandasWithState(
        first_seen_fn,
        outputStructType=FS_OUTPUT_SCHEMA,
        stateStructType=FS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# Stateful funnel: per-user stage machine (signup -> click -> purchase)
# ---------------------------------------------------------------------------

FUNNEL_OUTPUT_SCHEMA = "user_id LONG, stage LONG, stage_ts TIMESTAMP"
FUNNEL_STATE_SCHEMA = "stage LONG, last_us LONG"

_FUNNEL_STAGES = ("signup", "click", "purchase")


def funnel_fn(
    key, pdf_iter: "Iterator[pd.DataFrame]", state
) -> Iterator[pd.DataFrame]:
    """Advance the user's funnel stage on each qualifying event that
    is STRICTLY LATER than the previous stage's event (the batch
    funnel's semantics), emitting one row per stage completion.
    State is two longs per user — current stage and its event time —
    the minimum for a strictly-ordered funnel."""
    (user_id,) = key
    stage, last_us = state.get if state.exists else (0, -1)
    out_stage, out_ts = [], []
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            if stage >= len(_FUNNEL_STAGES):
                break
            us = int(ts.value // 1000)
            if etype == _FUNNEL_STAGES[stage] and us > last_us:
                stage += 1
                last_us = us
                out_stage.append(stage)
                out_ts.append(ts)
    state.update((stage, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_stage),
            "stage": out_stage,
            "stage_ts": out_ts,
        }
    )


def funnel(stream: DataFrame) -> DataFrame:
    """Streaming twin of funnel_signup_click_purchase: per-user stage
    machine over applyInPandasWithState.  Each stage completion is
    emitted exactly once, append-mode, the moment it happens — the
    real-time form of the batch funnel counts (count rows per stage
    downstream).  Same cross-batch caveat as first_seen: stage
    ordering is exact when the source preserves event-time order
    across micro-batches (the replay harness does); within a batch
    events are explicitly sorted."""
    return stream.groupBy("user_id").applyInPandasWithState(
        funnel_fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# Streaming conversion latency: first click -> first subsequent purchase
# ---------------------------------------------------------------------------

CONV_OUTPUT_SCHEMA = "user_id LONG, latency_s LONG, purchase_ts TIMESTAMP"
#: (first click epoch-us, -1 = none yet; done = 1 after the one emission)
CONV_STATE_SCHEMA = "click_us LONG, done LONG"


def conversion_latency_fn(
    key, pdf_iter: "Iterator[pd.DataFrame]", state
) -> Iterator[pd.DataFrame]:
    """Emit, exactly once per user, the lag from their FIRST click to
    the first purchase STRICTLY after it — the streaming twin of
    behavior_conversion_latency (whose hour histogram is one groupBy
    over these rows).  State is two longs; the click anchor and the
    done flag both survive micro-batch boundaries and checkpoint
    restarts.  latency_s floors each timestamp to seconds BEFORE
    subtracting, matching the batch query's unix_timestamp() grain."""
    (user_id,) = key
    click_us, done = state.get if state.exists else (-1, 0)
    out_lat, out_ts = [], []
    for pdf in pdf_iter:
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts, etype in zip(pdf["ts"], pdf["event_type"]):
            if done:
                break
            us = int(ts.value // 1000)
            if etype == "click" and click_us < 0:
                click_us = us
            elif etype == "purchase" and 0 <= click_us < us:
                done = 1
                out_lat.append(us // 1_000_000 - click_us // 1_000_000)
                out_ts.append(ts)
    state.update((click_us, done))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_lat),
            "latency_s": pd.Series(out_lat, dtype="int64"),
            "purchase_ts": out_ts,
        }
    )


def conversion_latency(stream: DataFrame) -> DataFrame:
    """Streaming conversion-latency rows over an events-shaped stream.
    Same cross-batch caveat as first_seen/funnel: the click-before-
    purchase ordering is exact when the source preserves event-time
    order across micro-batches (the replay harness does); within a
    batch events are explicitly sorted."""
    return stream.groupBy("user_id").applyInPandasWithState(
        conversion_latency_fn,
        outputStructType=CONV_OUTPUT_SCHEMA,
        stateStructType=CONV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# Stateful log compaction: last-write-wins changelog with tombstones
# ---------------------------------------------------------------------------

COMPACT_OUTPUT_SCHEMA = (
    "user_id LONG, last_event_id LONG, last_ts TIMESTAMP,"
    " last_type STRING, last_value_cents LONG, n_versions LONG,"
    " is_tombstone BOOLEAN"
)
COMPACT_STATE_SCHEMA = (
    "last_us LONG, last_eid LONG, last_type STRING,"
    " cents LONG, n_versions LONG"
)

#: Event type that plays the delete marker (matches the batch twin
#: cdc_log_compaction, operators/behavior.py).
COMPACT_TOMBSTONE = "error"


def compact_fn(
    key, pdf_iter: "Iterator[pd.DataFrame]", state
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into the key's compacted record ((ts,
    event_id) max wins) and emit the NEW compacted value — i.e. the
    downstream sees exactly the changelog a Kafka compacted topic
    would publish: one row per (key, batch-with-changes), each
    superseding the last, tombstones flagged rather than dropped so a
    consumer can delete.  State is O(1) per key (5 fields), the
    minimum for exact last-write-wins."""
    (user_id,) = key
    cur = list(state.get) if state.exists else None
    n_new = 0
    for pdf in pdf_iter:
        for r in pdf.itertuples():
            us = int(r.ts.value // 1000)
            eid = int(r.event_id)
            n_new += 1
            if cur is None or (us, eid) > (cur[0], cur[1]):
                cur = [
                    us,
                    eid,
                    str(r.event_type),
                    int(math.floor(r.value * 100)),
                    0,
                ]
    if n_new == 0 or cur is None:
        yield pd.DataFrame(
            {c: [] for c in (
                "user_id", "last_event_id", "last_ts", "last_type",
                "last_value_cents", "n_versions", "is_tombstone",
            )}
        )
        return
    prev_versions = state.get[4] if state.exists else 0
    cur[4] = prev_versions + n_new
    state.update(tuple(cur))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "last_event_id": [cur[1]],
            "last_ts": [pd.Timestamp(cur[0], unit="us")],
            "last_type": [cur[2]],
            "last_value_cents": [cur[3]],
            "n_versions": [cur[4]],
            "is_tombstone": [cur[2] == COMPACT_TOMBSTONE],
        }
    )


def compact(stream: DataFrame) -> DataFrame:
    """Streaming twin of the batch cdc_log_compaction: the batch form
    compacts a complete log in one window; this form maintains the
    compacted table INCREMENTALLY, emitting a changelog row whenever
    a key's latest record changes.  The differential test replays the
    ordered log and checks the final emission per key equals the
    batch compaction (tombstoned keys emit flagged rather than
    vanishing — a streaming consumer needs the delete event; the
    batch form's drop is the terminal materialization of it)."""
    return stream.groupBy("user_id").applyInPandasWithState(
        compact_fn,
        outputStructType=COMPACT_OUTPUT_SCHEMA,
        stateStructType=COMPACT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
