"""Golden-document test (SURVEY.md §5 strategy #2): rebuild the
DATA_NODE_HEALTH example from /root/reference/README.md:61-107 out of
the equivalent system.replicas input rows and compare canonical JSON.

Exercises the full nest/rename/sentinel pipeline: P4 rename, P5 pct
zero-guard, P6 sentinel scrub, P7 empty-drop (via to_json null
dropping), F1 shard-number extraction, N1 two-level nesting, A6
activeReplicas string.
"""

from __future__ import annotations

import json

from fortisiem_clickhouse_monitor_spark.plans.health import data_health_document

REPLICAS_COLS = (
    "node_ip STRING, database STRING, tbl STRING, device_name STRING,"
    " is_readonly INT, is_session_expired INT, queue_size INT,"
    " inserts_in_queue INT, merges_in_queue INT, part_mutations_in_queue INT,"
    " last_queue_update STRING, absolute_delay LONG, active_replicas INT,"
    " total_replicas INT, queue_oldest_time STRING, inserts_oldest_time STRING,"
    " oldest_part_to_get STRING, active_replica_names STRING"
)

SENT = "1969-12-31 18:00:00"
IP = "192.168.128.222"
NAME = "forti-super.home.mickeletto.local"

# The two replica rows behind README.md:66-101 (events_replicated row
# keeps its oldest-time fields; summary row carries sentinels that must
# vanish from the JSON).
ROWS = [
    (IP, "fsiem", "events_replicated", NAME, 0, 0, 1, 1, 0, 0,
     "2024-06-11 10:28:04", 1782019, 1, 1, "2024-05-21 19:27:53",
     "2024-05-21 19:27:53", "18250-20240521_6839_6884_9", "1"),
    (IP, "fsiem", "summary", NAME, 0, 0, 0, 0, 0, 0,
     "2024-06-11 10:25:49", 0, 1, 1, SENT, SENT, "", "1"),
    # other-database row must be filtered out (P1)
    (IP, "system", "query_log", NAME, 0, 0, 0, 0, 0, 0,
     "2024-06-11 10:00:00", 0, 1, 1, SENT, SENT, "", "1"),
]

EXPECTED = {
    "shard": 1,
    "nodes": [
        {
            "deviceName": NAME,
            "deviceIp": IP,
            "replicas": [
                {
                    "dbName": "fsiem",
                    "dbTable": "events_replicated",
                    "readonly": 0,
                    "sessionExpired": 0,
                    "queueSize": 1,
                    "insertsInQueue": 1,
                    "mergesInQueue": 0,
                    "partMutationsInQueue": 0,
                    "lastQueueUpdate": "2024-06-11 10:28:04",
                    "absoluteDelay": 1782019,
                    "replicasOnlinePct": 100,
                    "queueOldestTime": "2024-05-21 19:27:53",
                    "insertsOldestTime": "2024-05-21 19:27:53",
                    "oldestPartToGetTime": "18250-20240521_6839_6884_9",
                    "activeReplicas": "1",
                },
                {
                    "dbName": "fsiem",
                    "dbTable": "summary",
                    "readonly": 0,
                    "sessionExpired": 0,
                    "queueSize": 0,
                    "insertsInQueue": 0,
                    "mergesInQueue": 0,
                    "partMutationsInQueue": 0,
                    "lastQueueUpdate": "2024-06-11 10:25:49",
                    "absoluteDelay": 0,
                    "replicasOnlinePct": 100,
                    "activeReplicas": "1",
                },
            ],
        }
    ],
}


def test_golden_data_health_document(spark):
    replicas = spark.createDataFrame(ROWS, schema=REPLICAS_COLS)
    topology = spark.createDataFrame(
        [("Shard 1", IP)], schema="shard_name STRING, node_ip STRING"
    )
    out = data_health_document(replicas, topology).collect()
    assert len(out) == 1
    row = out[0]
    got = {"shard": row["shard"], "nodes": json.loads(row["nodes_json"])}
    assert got == EXPECTED
