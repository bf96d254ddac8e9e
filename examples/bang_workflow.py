#!/usr/bin/env python
"""The reference library's own workflow, end to end, on Spark.

Mirrors SURVEY §3.1's traced lifecycle: a cache dir of fetched batch JSON
documents -> normalized survey/chat/team frames -> per-question processor
recodes -> the wide (user, round) analysis frame -> CSV export. Also shows
the cache dir read through the custom Python DataSource connector
(one cache file = one partition).

Run from the repo root:  python examples/bang_workflow.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bangdatapipeline_spark import bang  # noqa: E402
from bangdatapipeline_spark.session import get_spark  # noqa: E402
from bangdatapipeline_spark.sources import bangcache, export_csv  # noqa: E402

DEMO_BATCH = {
    "batch_id": "demo-1",
    "template": "icebreaker",
    "team_size": 2,
    "users": [
        {"user_id": "u1", "nickname": "red fox", "payment": 12.0},
        {"user_id": "u2", "nickname": "blue jay", "payment": 12.0},
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
                        {"user_id": "u1", "time": "2024-05-01T10:01:00", "message": "hi"},
                        {"user_id": "u2", "time": "2024-05-01T10:01:30", "message": "hello"},
                    ],
                }
            ],
            "mid_surveys": [
                {"user_id": "u1", "answers": [{"q": "viable", "answer": "Agree"}]},
                {"user_id": "u2", "answers": [{"q": "viable", "answer": "Neutral"}]},
            ],
            "post_surveys": [],
        }
    ],
}


def main() -> None:
    spark = get_spark()
    with tempfile.TemporaryDirectory() as tmp:
        cache = os.path.join(tmp, "cache")
        os.makedirs(cache)
        with open(os.path.join(cache, "demo-1.json"), "w") as f:
            json.dump(DEMO_BATCH, f)

        # 1. fetch-cache-parse (minus the HTTP GET): explicit schema read
        raw = bang.load_batches(spark, cache)

        # 2. survey processing: flatten -> recode -> widen -> merge
        frame = bang.analysis_frame(
            raw, questions=["viable"], processors={"viable": bang.likert5}
        )
        frame.show()

        # 3. chat processing: message frame + per-user stats
        bang.chat_stats(bang.chats(raw)).show()

        # 4. notebook deliverable
        export_csv(frame, os.path.join(tmp, "analysis_csv"))
        print("wrote", os.listdir(os.path.join(tmp, "analysis_csv")))

        # 5. the same cache dir as a first-class connector
        bangcache.register(spark)
        spark.read.format("bangcache").option("path", cache).load().show()


if __name__ == "__main__":
    main()
