"""A12 full export envelope (reference utils/database.py:623-724): envelope
keys, section framing, row contents and ordering for one user, plus the
distributed all-users form."""

from __future__ import annotations

import json

import pytest

from universal_text_extractor_spark.operators.export import (
    FEEDBACK_COLS,
    LOG_COLS,
    export_user_data,
    logs_from_extracted,
    user_envelopes,
)


@pytest.fixture(scope="module")
def frames(spark):
    logs = spark.createDataFrame(
        [
            (1, "alice", "a.pdf", "pdf", 1000, 0.5, 1, 0, "2026-01-02 10:00:00"),
            (2, "alice", "b.html", "html", 2000, 0.1, 1, 0, "2026-01-03 09:00:00"),
            (3, "bob", "c.txt", "txt", 10, 0.01, 0, 0, "2026-01-01 08:00:00"),
            # same timestamp as id=1 → id ASC tiebreak
            (4, "alice", "d.xls", "xls", 500, 0.2, 1, 0, "2026-01-02 10:00:00"),
            # NULL timestamp → sorts LAST on both export paths (desc
            # nulls-last parity; r5 review finding)
            (5, "bob", "e.rtf", "rtf", 77, 0.05, 1, 0, None),
        ],
        "id int, user_id string, file_name string, file_type string, "
        "file_size_bytes long, processing_time double, success int, "
        "ocr_used int, timestamp string",
    )
    feedback = spark.createDataFrame(
        [
            (1, "alice", "bug", "slow", 2, "2026-01-05 12:00:00"),
            (2, "carol", "praise", "nice", 5, "2026-01-06 12:00:00"),
        ],
        "id int, username string, feedback_type string, feedback_text string, "
        "rating int, timestamp string",
    )
    return logs, feedback


def test_json_envelope_keys_and_rows(frames):
    logs, feedback = frames
    doc = json.loads(export_user_data(logs, feedback, "alice"))
    assert set(doc) == {"username", "export_date", "extraction_logs", "feedback"}
    assert doc["username"] == "alice"
    assert [set(r) for r in doc["extraction_logs"]] == [set(LOG_COLS)] * 3
    # ordering: timestamp DESC, id ASC (tie between ids 1 and 4)
    assert [r["id"] for r in doc["extraction_logs"]] == [2, 1, 4]
    assert doc["extraction_logs"][0]["file_name"] == "b.html"
    assert [r["id"] for r in doc["feedback"]] == [1]
    assert set(doc["feedback"][0]) == set(FEEDBACK_COLS)


def test_csv_and_txt_framing(frames):
    logs, feedback = frames
    csv_out = export_user_data(logs, feedback, "alice", format_type="csv")
    assert csv_out.startswith("EXTRACTION LOGS\n")
    assert "\nUSER FEEDBACK\n" in csv_out
    assert "id,user_id,file_name,file_type" in csv_out
    txt = export_user_data(logs, feedback, "alice", format_type="txt")
    assert txt.splitlines()[0] == "Data Export for User: alice"
    assert "=== EXTRACTION LOGS ===" in txt and "=== USER FEEDBACK ===" in txt
    assert "-" * 40 in txt


def test_data_type_selection(frames):
    logs, feedback = frames
    only_fb = json.loads(
        export_user_data(logs, feedback, "alice", data_types=["feedback"])
    )
    assert "extraction_logs" not in only_fb and "feedback" in only_fb


def test_user_envelopes_all_users(frames):
    logs, feedback = frames
    rows = {r["username"]: r for r in user_envelopes(logs, feedback).collect()}
    assert set(rows) == {"alice", "bob", "carol"}
    assert [s["id"] for s in rows["alice"]["extraction_logs"]] == [2, 1, 4]
    # null-ts row last, matching the single-user orderBy(desc) path
    assert [s["id"] for s in rows["bob"]["extraction_logs"]] == [3, 5]
    bob_doc = json.loads(export_user_data(logs, feedback, "bob"))
    assert [r["id"] for r in bob_doc["extraction_logs"]] == [3, 5]
    assert rows["bob"]["feedback"] == []  # missing side → empty array
    assert rows["carol"]["extraction_logs"] == []
    assert rows["carol"]["feedback"][0]["rating"] == 5


def test_logs_adapter_matches_pipeline(spark):
    from universal_text_extractor_spark.operators.extract import extract_pages_fused
    from universal_text_extractor_spark.sources.pages_gen import generate_pages_df

    ext = extract_pages_fused(generate_pages_df(spark, 30, partitions=2),
                              num_partitions=2)
    logs = logs_from_extracted(ext)
    assert set(logs.columns) == set(LOG_COLS)
    assert logs.count() == 30
