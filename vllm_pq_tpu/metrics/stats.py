"""Engine metrics (role of reference ``v1/metrics``: SchedulerStats /
IterationStats + Logging & Prometheus stat loggers).

Prometheus metrics are registered lazily so importing the engine doesn't
require a metrics server; the OpenAI frontend exposes them on /metrics.
"""

import time
from typing import List, Optional

from vllm_pq_tpu.config import EngineConfig
from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)

_PROM = None


def get_prometheus():
    """Lazy prometheus metric bundle (None if lib unavailable)."""
    global _PROM
    if _PROM is not None:
        return _PROM
    try:
        from prometheus_client import Counter, Gauge, Histogram
        _PROM = {
            "num_running": Gauge("vpq:num_requests_running",
                                 "running requests"),
            "num_waiting": Gauge("vpq:num_requests_waiting",
                                 "waiting requests"),
            "kv_usage": Gauge("vpq:kv_cache_usage_perc",
                              "KV cache usage"),
            "prompt_tokens": Counter("vpq:prompt_tokens_total",
                                     "prefill tokens"),
            "generation_tokens": Counter("vpq:generation_tokens_total",
                                         "generated tokens"),
            "preemptions": Counter("vpq:num_preemptions_total",
                                   "preemptions"),
            "prefix_hits": Counter("vpq:prefix_cache_hits_total",
                                   "prefix cache block hits"),
            "prefix_queries": Counter("vpq:prefix_cache_queries_total",
                                      "prefix cache block queries"),
            "ttft": Histogram("vpq:time_to_first_token_seconds",
                              "TTFT",
                              buckets=(.01, .025, .05, .1, .25, .5, 1,
                                       2.5, 5, 10)),
            "tpot": Histogram("vpq:time_per_output_token_seconds",
                              "TPOT",
                              buckets=(.005, .01, .025, .05, .1, .25, .5)),
            "e2e": Histogram("vpq:e2e_request_latency_seconds", "E2E",
                             buckets=(.1, .5, 1, 2.5, 5, 10, 30, 60)),
        }
    except Exception:
        _PROM = {}
    return _PROM


class StatsLogger:
    """Console logger (1/interval) + prometheus counters."""

    def __init__(self, config: EngineConfig):
        self.enabled = config.observability.collect_metrics
        self.interval = config.observability.log_stats_interval_s
        # OTel spans per finished request (reference do_tracing)
        from vllm_pq_tpu.tracing import init_tracer
        self.tracer = init_tracer(
            "vllm_pq_tpu", config.observability.otlp_traces_endpoint)
        self._requests = {}
        self.last_log = time.monotonic()
        self.step_count = 0
        self.token_count = 0
        self.gen_token_count = 0
        self.arrivals = {}
        self.first_token_time = {}
        self._last_sched_stats = {}
        self._last_prefix = (0, 0)

    def on_request_arrival(self, request) -> None:
        self.arrivals[request.request_id] = time.monotonic()
        if self.tracer is not None:
            self._requests[request.request_id] = request

    def on_step(self, core_outputs: List, step_time: float,
                sched_stats: dict) -> None:
        if not self.enabled:
            return
        now = time.monotonic()
        self.step_count += 1
        prom = get_prometheus()
        gen = 0
        for eco in core_outputs:
            gen += len(eco.new_token_ids)
            rid = eco.req_id
            if rid in self.arrivals and rid not in self.first_token_time:
                self.first_token_time[rid] = now
                if prom:
                    prom["ttft"].observe(now - self.arrivals[rid])
            if eco.finish_reason is not None and rid in self.arrivals:
                if prom:
                    prom["e2e"].observe(now - self.arrivals[rid])
                if self.tracer is not None and rid in self._requests:
                    from vllm_pq_tpu.tracing import trace_request_done
                    req = self._requests[rid]
                    ft = self.first_token_time.get(rid, now)
                    trace_request_done(
                        self.tracer, req,
                        queue_s=0.0,
                        ttft_s=ft - self.arrivals[rid],
                        e2e_s=now - self.arrivals[rid],
                        prompt_tokens=req.num_prompt_tokens,
                        completion_tokens=req.num_output_tokens)
                self._requests.pop(rid, None)
                self.arrivals.pop(rid, None)
                self.first_token_time.pop(rid, None)
        self.gen_token_count += gen
        if prom:
            prom["num_running"].set(sched_stats.get("num_running", 0))
            prom["num_waiting"].set(sched_stats.get("num_waiting", 0))
            prom["kv_usage"].set(sched_stats.get("kv_cache_usage", 0.0))
            prom["generation_tokens"].inc(gen)
            q, h = (sched_stats.get("prefix_cache_queries", 0),
                    sched_stats.get("prefix_cache_hits", 0))
            dq, dh = q - self._last_prefix[0], h - self._last_prefix[1]
            if dq > 0:
                prom["prefix_queries"].inc(dq)
            if dh > 0:
                prom["prefix_hits"].inc(dh)
            self._last_prefix = (q, h)
        self._last_sched_stats = sched_stats

        if now - self.last_log >= self.interval:
            dt = now - self.last_log
            logger.info(
                "tput %.1f tok/s | running %d | waiting %d | kv %.1f%% | "
                "preemptions %d",
                self.gen_token_count / dt,
                sched_stats.get("num_running", 0),
                sched_stats.get("num_waiting", 0),
                100 * sched_stats.get("kv_cache_usage", 0.0),
                sched_stats.get("num_preemptions", 0))
            self.gen_token_count = 0
            self.last_log = now
