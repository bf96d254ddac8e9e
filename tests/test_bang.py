"""Bang batch workflow (bangdatapipeline_spark.bang) — reference-parity
checks on a synthetic nested batch document.

The fixture mirrors the reference's batch shape (SURVEY §1.1): one JSON
document per batch, rounds -> teams -> users, chat nested per team,
mid/post surveys nested per round. Expectations are hand-computed."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from bangdatapipeline_spark import bang


def _batch_doc() -> dict:
    return {
        "batch_id": "b1",
        "template": "icebreaker",
        "team_size": 2,
        "users": [
            {"user_id": "u1", "nickname": "red fox", "payment": 12.0},
            {"user_id": "u2", "nickname": "blue jay", "payment": 12.0},
            {"user_id": "u3", "nickname": "green owl", "payment": 10.5},
            {"user_id": "u4", "nickname": "grey wolf", "payment": 10.5},
        ],
        "rounds": [
            {
                "index": 0,
                "start_time": "2024-05-01T10:00:00",
                "end_time": "2024-05-01T10:10:00",
                "teams": [
                    {
                        "team_id": "t1",
                        "users": ["u1", "u2"],
                        "chat": [
                            {"user_id": "u1", "time": "2024-05-01T10:01:00", "message": "hi there"},
                            {"user_id": "u2", "time": "2024-05-01T10:01:30", "message": "hello"},
                            {"user_id": "u1", "time": "2024-05-01T10:02:00", "message": "lets go"},
                        ],
                    },
                    {
                        "team_id": "t2",
                        "users": ["u3", "u4"],
                        "chat": [
                            {"user_id": "u3", "time": "2024-05-01T10:03:00", "message": "hey"},
                        ],
                    },
                ],
                "mid_surveys": [
                    {"user_id": "u1", "answers": [
                        {"q": "viable", "answer": "Agree"},
                        {"q": "mood", "answer": "good"},
                    ]},
                    {"user_id": "u2", "answers": [
                        {"q": "viable", "answer": "Strongly agree"},
                        {"q": "mood", "answer": "ok"},
                    ]},
                    {"user_id": "u3", "answers": [
                        {"q": "viable", "answer": "Neutral"},
                    ]},
                ],
                "post_surveys": [
                    {"user_id": "u1", "answers": [{"q": "partner", "answer": "u2"}]},
                ],
            },
            {
                "index": 1,
                "start_time": "2024-05-01T10:15:00",
                "end_time": "2024-05-01T10:25:00",
                "teams": [
                    {
                        "team_id": "t3",
                        "users": ["u1", "u3"],
                        "chat": [],
                    },
                ],
                "mid_surveys": [
                    {"user_id": "u1", "answers": [{"q": "viable", "answer": "disagree"}]},
                    {"user_id": "u3", "answers": [{"q": "viable", "answer": "bogus label"}]},
                ],
                "post_surveys": [],
            },
        ],
    }


@pytest.fixture(scope="module")
def raw(spark, tmp_path_factory):
    cache = tmp_path_factory.mktemp("bang_cache")
    (cache / "b1.json").write_text(json.dumps(_batch_doc(), indent=2))
    return bang.load_batches(spark, str(cache))


def test_users_dimension(raw):
    rows = {r.user_id: r for r in bang.users(raw).collect()}
    assert set(rows) == {"u1", "u2", "u3", "u4"}
    assert rows["u1"].nickname == "red fox"
    assert rows["u3"].payment == 10.5


def test_team_members_grain(raw):
    rows = {(r.round, r.team_id, r.user_id) for r in bang.team_members(raw).collect()}
    assert (0, "t1", "u1") in rows and (0, "t2", "u4") in rows
    assert (1, "t3", "u3") in rows
    assert len(rows) == 6  # 4 in round 0, 2 in round 1


def test_surveys_long_mid_and_post(raw):
    mid = bang.surveys(raw, "mid")
    assert mid.count() == 7  # 2+2+1 answers in round 0, 1+1 in round 1
    post = bang.surveys(raw, "post").collect()
    assert len(post) == 1 and post[0].q == "partner" and post[0].answer == "u2"
    with pytest.raises(ValueError):
        bang.surveys(raw, "final")


def test_surveys_wide_with_likert_processor(raw):
    wide = bang.surveys_wide(
        bang.surveys(raw, "mid"),
        questions=["viable", "mood"],
        processors={"viable": bang.likert5},
    )
    rows = {(r.round, r.user_id): r for r in wide.collect()}
    assert rows[(0, "u1")].viable == 4  # "Agree" (case-insensitive)
    assert rows[(0, "u2")].viable == 5
    assert rows[(0, "u3")].viable == 3
    assert rows[(1, "u1")].viable == 2
    assert rows[(1, "u3")].viable is None  # unrecognized label -> NULL
    assert rows[(0, "u1")].mood == "good"  # unprocessed stays raw
    assert rows[(0, "u3")].mood is None  # unanswered question -> NULL
    with pytest.raises(ValueError):
        bang.surveys_wide(bang.surveys(raw, "mid"), ["viable"], {"nope": bang.likert5})


def test_chats_and_stats(raw):
    msgs = bang.chats(raw)
    assert msgs.count() == 4
    stats = {(r.round, r.user_id): r for r in bang.chat_stats(msgs).collect()}
    u1 = stats[(0, "u1")]
    assert u1.n_msgs == 2
    assert u1.total_chars == len("hi there") + len("lets go")
    assert str(u1.first_msg) == "2024-05-01 10:01:00"
    assert (0, "u3") in stats and stats[(0, "u3")].n_msgs == 1


def test_analysis_frame_merges_membership_and_chat(raw):
    frame = bang.analysis_frame(
        raw, questions=["viable", "mood"], processors={"viable": bang.likert5}
    )
    rows = {(r.round, r.user_id): r for r in frame.collect()}
    # u1 round 0: survey + team + chat all present
    r = rows[(0, "u1")]
    assert r.viable == 4 and r.team_id == "t1" and r.n_msgs == 2
    # u3 round 1: surveyed, on a team, but no chat -> stats NULL
    r = rows[(1, "u3")]
    assert r.team_id == "t3" and r.n_msgs is None
    # grain: one row per surveyed (round, user)
    assert len(rows) == 5


def test_whole_workflow_is_narrow_until_the_pivot(raw):
    """The normalizer chains must stay shuffle-free: explode chains are
    narrow ops; the first Exchange belongs to the pivot/aggregate."""
    for df in (bang.team_members(raw), bang.surveys(raw, "mid"), bang.chats(raw)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]


def test_bangcache_python_datasource(spark, tmp_path):
    """The custom Python DataSource reads the cache dir with one
    partition per file and emits correct batch summaries."""
    from bangdatapipeline_spark.sources import bangcache

    cache = tmp_path / "cache"
    cache.mkdir()
    doc = _batch_doc()
    (cache / "b1.json").write_text(json.dumps(doc))
    doc2 = dict(doc, batch_id="b2", rounds=doc["rounds"][:1])
    (cache / "b2.json").write_text(json.dumps(doc2))

    bangcache.register(spark)
    df = spark.read.format("bangcache").option("path", str(cache)).load()
    rows = {r.batch_id: r for r in df.collect()}
    assert set(rows) == {"b1", "b2"}
    b1 = rows["b1"]
    assert (b1.n_users, b1.n_rounds, b1.n_teams, b1.n_messages) == (4, 2, 3, 4)
    b2 = rows["b2"]
    assert (b2.n_rounds, b2.n_teams, b2.n_messages) == (1, 2, 4)
    # one input partition per cache file -> parallel ingest
    assert df.rdd.getNumPartitions() == 2
