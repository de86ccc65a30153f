"""Synthetic clickstream workload generator (S5) + the reference's
three unit-test scenario generators (SURVEY §5.1).

Replicates the *distributions* of botgen.py (seeded, deterministic):
- users: ip 172.10.x.x, click:view = 1:9, 10 categories (botgen.py:27,39,45)
- bots:  ip 172.20.x.x, click:view = 3:1, 20 categories, one action
  per 2 s each (botgen.py:24,42,48,67,76)

and of TestUtil.scala:
- ``requests_burst``   (TestUtil.scala:19-27)
- ``clicks_to_views``  (TestUtil.scala:29-43)
- ``category_hopper``  (TestUtil.scala:45-56)

Output records are wire-format dicts {time (epoch sec), categoryId,
ip, action} — writable as JSON lines for the file-stream source or
convertible to LogRecord rows for batch tests.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass


@dataclass(frozen=True)
class Action:
    time: int  # epoch seconds
    category_id: str
    ip: str
    action: str  # click | view

    def to_wire(self) -> dict:
        return {
            "time": self.time,
            "categoryId": self.category_id,
            "ip": self.ip,
            "action": self.action,
        }


DEFAULT_INTERVAL_SEC = 600  # TestUtil.scala trailing interval


def _spread(base_time: int, n: int, interval: int) -> list[int]:
    """n timestamps evenly spread over the trailing interval
    (TestUtil.scala:19-27: base + (interval/requests)*i)."""
    return [base_time + (interval * i) // n for i in range(n)]


def requests_burst(
    ip: str,
    n: int,
    base_time: int = 0,
    interval: int = DEFAULT_INTERVAL_SEC,
    seed: int = 42,
) -> list[Action]:
    """n requests, random 50/50 click/view coin, single category."""
    rng = random.Random(seed)
    return [
        Action(t, "1000", ip, rng.choice(("click", "view")))
        for t in _spread(base_time, n, interval)
    ]


def clicks_to_views(
    ip: str,
    n: int,
    ratio: int,
    base_time: int = 0,
    interval: int = DEFAULT_INTERVAL_SEC,
) -> list[Action]:
    """views = n/(ratio+1), clicks = rest (TestUtil.scala:29-43)."""
    views = n // (ratio + 1)
    clicks = n - views
    times = _spread(base_time, n, interval)
    acts = ["click"] * clicks + ["view"] * views
    return [Action(t, "1000", ip, a) for t, a in zip(times, acts)]


def category_hopper(
    ip: str,
    n: int,
    n_categories: int,
    base_time: int = 0,
    interval: int = DEFAULT_INTERVAL_SEC,
) -> list[Action]:
    """Round-robin over k categories (TestUtil.scala:45-56)."""
    return [
        Action(t, f"cat{i % n_categories}", ip, "view")
        for i, t in enumerate(_spread(base_time, n, interval))
    ]


def botgen_workload(
    n_bots: int = 1,
    n_users: int = 1000,
    user_freq: int = 100,
    duration_sec: int = 300,
    base_time: int = 0,
    seed: int = 42,
) -> list[Action]:
    """Statistical workload with botgen.py's population profiles.

    Expected property (FIXTURES.md §3): every 172.20.* ip is
    eventually flagged; no 172.10.* ip is.
    """
    rng = random.Random(seed)
    user_cats = [str(1000 + i) for i in range(10)]
    bot_cats = [str(1000 + i) for i in range(20)]
    out: list[Action] = []
    # users: `user_freq` requests/s sampled uniformly over the population
    for sec in range(duration_sec):
        for _ in range(user_freq):
            uid = rng.randrange(n_users)
            ip = f"172.10.{uid // 255}.{uid % 255}"
            action = "click" if rng.random() < 0.1 else "view"
            out.append(Action(base_time + sec, rng.choice(user_cats), ip, action))
    # bots: one action per 2 s each
    for bid in range(n_bots):
        ip = f"172.20.{bid // 255}.{bid % 255}"
        for sec in range(0, duration_sec, 2):
            action = "click" if rng.random() < 0.75 else "view"
            out.append(Action(base_time + sec, rng.choice(bot_cats), ip, action))
    out.sort(key=lambda a: (a.time, a.ip))
    return out


def write_json_lines(actions: list[Action], path: str) -> str:
    """Write wire-format JSON lines (one file = one source micro-batch
    unit under maxFilesPerTrigger=1)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for a in actions:
            f.write(json.dumps(a.to_wire()) + "\n")
    return path


def actions_to_log_records(spark, actions: list[Action]):
    """Batch DataFrame in LogRecord shape (TestUtil.scala:61-66) —
    entry-point-3 analog: same transform runs on this as on streams."""
    from pyspark.sql import functions as F

    from ..schemas import ACTION_SCHEMA

    rows = [(a.time, a.category_id, a.ip, a.action) for a in actions]
    df = spark.createDataFrame(rows, ACTION_SCHEMA)
    return df.select(
        F.col("ip"),
        F.timestamp_seconds("time").alias("time"),
        F.when(F.col("action") == "click", 1).otherwise(0).cast("long").alias("clicks"),
        F.when(F.col("action") == "view", 1).otherwise(0).cast("long").alias("views"),
        F.col("categoryId").alias("category"),
    )
