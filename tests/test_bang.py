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


def test_team_viability(raw):
    """Hand-computed: r0/t1 = mean(4, 5) = 4.5 from u1 Agree + u2
    Strongly agree; r0/t2 = 3.0 (u3 Neutral); r1/t3 = 2.0 — u1
    'disagree' recodes, u3's 'bogus label' is NULL and drops both from
    the mean and from n_resp (the reference's NaN semantics)."""
    rows = {
        (r.round, r.team_id): (r.n_resp, r.viability)
        for r in bang.team_viability(raw).collect()
    }
    assert rows == {
        (0, "t1"): (2, 4.5),
        (0, "t2"): (1, 3.0),
        (1, "t3"): (1, 2.0),
    }


def test_turn_taking(raw):
    """t1: 3 msgs from {u1: 2, u2: 1} -> top share 2/3 (666666 ppm,
    floor), entropy -(2/3 ln 2/3 + 1/3 ln 1/3) = 0.6365 nats; t2: one
    speaker -> share 1e6, entropy 0; t3 has no chat -> no row."""
    rows = {
        (r.round, r.team_id): (
            r.n_msgs,
            r.n_active,
            r.top_share_ppm,
            r.entropy_nats,
        )
        for r in bang.turn_taking(bang.chats(raw)).collect()
    }
    assert rows == {
        (0, "t1"): (3, 2, 666666, 0.6365),
        (0, "t2"): (1, 1, 1000000, 0.0),
    }


def test_response_latency(raw):
    """t1's messages at 10:01:00 / 10:01:30 / 10:02:00 give gaps
    [30, 30] -> lower median 30; t2 has one message (no gaps) and t3
    none, so neither emits a row."""
    rows = {
        (r.round, r.team_id): (r.n_gaps, r.median_gap_s)
        for r in bang.response_latency(bang.chats(raw)).collect()
    }
    assert rows == {(0, "t1"): (2, 30)}
