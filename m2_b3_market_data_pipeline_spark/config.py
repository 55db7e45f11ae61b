"""Run configuration: env/CLI -> parameters (SURVEY.md §2.12).

Replaces the reference's three config surfaces — Glue job-arg parsing
(etl/etl_job.py:14-32, both ``--key=value`` and ``--key value`` forms),
the ``.env`` loader (scraper/scraper_upload.py:13-23), and hardwired
wall-clock dates (etl/etl_job.py:37) — with one dataclass. ``run_date``
is explicit and injectable: the reference's nondeterministic
``datetime.now()`` output path is a documented defect (SURVEY.md §7.4
risk 3), not a behavior to reproduce.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import date


def parse_job_args(argv: list[str]) -> dict[str, str]:
    """Glue-style arg parsing: ``--key=value`` and ``--key value``
    (parity: etl/etl_job.py:14-32)."""
    out: dict[str, str] = {}
    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg.startswith("--"):
            key = arg[2:]
            if "=" in key:
                key, _, value = key.partition("=")
                out[key] = value
            elif i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                out[key] = argv[i + 1]
                i += 1
            else:
                out[key] = ""
        i += 1
    return out


@dataclass
class RunConfig:
    raw_path: str = "data/raw"
    refined_path: str = "data/refined"
    checkpoint_path: str = "data/checkpoints/etl"
    run_date: str = field(default_factory=lambda: date.today().strftime("%Y-%m-%d"))
    ticker: str = "VALE3.SA"

    @classmethod
    def from_sources(cls, argv: list[str] | None = None, env: dict[str, str] | None = None) -> "RunConfig":
        """Precedence: CLI args > environment > defaults."""
        env = env if env is not None else dict(os.environ)
        args = parse_job_args(argv or [])
        pick = lambda key, env_key: args.get(key) or env.get(env_key)  # noqa: E731
        cfg = cls()
        cfg.raw_path = pick("raw-path", "SPARK_GRAFT_RAW") or cfg.raw_path
        cfg.refined_path = pick("refined-path", "SPARK_GRAFT_REFINED") or cfg.refined_path
        cfg.checkpoint_path = pick("checkpoint-path", "SPARK_GRAFT_CKPT") or cfg.checkpoint_path
        cfg.run_date = pick("run-date", "SPARK_GRAFT_RUN_DATE") or cfg.run_date
        cfg.ticker = pick("ticker", "TICKER") or cfg.ticker
        return cfg
