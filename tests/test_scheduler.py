"""Scheduler unit tests: construct Requests directly and assert on
SchedulerOutput / block ids, no model (mirrors reference
tests/v1/core/test_scheduler.py strategy)."""

from vllm_pq_tpu.config import CacheConfig, SchedulerConfig
from vllm_pq_tpu.core.scheduler import Scheduler
from vllm_pq_tpu.core.scheduler_output import ModelRunnerOutput
from vllm_pq_tpu.request import Request, RequestStatus
from vllm_pq_tpu.sampling_params import SamplingParams


def make_scheduler(max_num_seqs=8, max_tokens_budget=64, num_blocks=128,
                   block_size=4, max_model_len=128, caching=True):
    return Scheduler(
        SchedulerConfig(max_num_seqs=max_num_seqs,
                        max_num_batched_tokens=max_tokens_budget,
                        max_model_len=max_model_len,
                        num_preallocate_blocks=0),
        CacheConfig(block_size=block_size, enable_prefix_caching=caching),
        num_kv_blocks=num_blocks,
    )


def make_req(req_id, num_tokens, max_tokens=32, **kw):
    return Request(str(req_id), list(range(num_tokens)),
                   SamplingParams(max_tokens=max_tokens, **kw),
                   eos_token_id=None)


def fake_run(sched_out, next_tok=7):
    """Simulate the model runner: one sampled token per scheduled req."""
    out = ModelRunnerOutput()
    for req_id in sched_out.num_scheduled_tokens:
        out.req_ids.append(req_id)
        out.sampled_token_ids[req_id] = [next_tok]
    return out


def test_prefill_then_decode():
    sched = make_scheduler()
    req = make_req("a", 10)
    sched.add_request(req)
    out = sched.schedule()
    assert out.num_scheduled_tokens["a"] == 10
    eco = sched.update_from_output(out, fake_run(out))
    assert eco[0].new_token_ids == [7]
    assert req.num_computed_tokens == 10
    # decode step
    out2 = sched.schedule()
    assert out2.num_scheduled_tokens["a"] == 1
    assert not out2.scheduled_new_reqs and len(out2.scheduled_cached_reqs) == 1


def test_chunked_prefill():
    sched = make_scheduler(max_tokens_budget=16)
    req = make_req("a", 40)
    sched.add_request(req)
    out = sched.schedule()
    assert out.num_scheduled_tokens["a"] == 16
    eco = sched.update_from_output(out, fake_run(out))
    assert eco == []  # partial prefill emits nothing
    out = sched.schedule()
    assert out.num_scheduled_tokens["a"] == 16
    sched.update_from_output(out, fake_run(out))
    out = sched.schedule()
    assert out.num_scheduled_tokens["a"] == 8
    eco = sched.update_from_output(out, fake_run(out))
    assert eco[0].new_token_ids == [7]


def test_token_budget_shared():
    sched = make_scheduler(max_tokens_budget=16)
    sched.add_request(make_req("a", 10))
    # distinct prompt so no prefix-cache hit
    b = Request("b", list(range(100, 110)), SamplingParams(max_tokens=32))
    sched.add_request(b)
    out = sched.schedule()
    assert out.num_scheduled_tokens["a"] == 10
    assert out.num_scheduled_tokens["b"] == 6
    assert out.total_num_scheduled_tokens == 16


def test_max_num_seqs_cap():
    sched = make_scheduler(max_num_seqs=2)
    for i in range(4):
        sched.add_request(make_req(i, 4))
    out = sched.schedule()
    assert len(out.num_scheduled_tokens) == 2


def test_eos_stop():
    sched = make_scheduler()
    req = Request("a", [1, 2, 3], SamplingParams(max_tokens=32),
                  eos_token_id=42)
    sched.add_request(req)
    out = sched.schedule()
    eco = sched.update_from_output(out, fake_run(out, next_tok=42))
    assert eco[0].finish_reason == "stop"
    assert not sched.has_unfinished_requests()
    # blocks freed
    assert sched.kv_cache_manager.block_pool.get_usage() == 0.0


def test_max_tokens_stop():
    sched = make_scheduler()
    req = make_req("a", 4, max_tokens=2)
    sched.add_request(req)
    for step in range(2):
        out = sched.schedule()
        eco = sched.update_from_output(out, fake_run(out))
    assert eco[0].finish_reason == "length"
    assert not sched.has_unfinished_requests()


def test_stop_token_ids():
    sched = make_scheduler()
    req = Request("a", [1, 2, 3],
                  SamplingParams(max_tokens=32, stop_token_ids=[7]))
    sched.add_request(req)
    out = sched.schedule()
    eco = sched.update_from_output(out, fake_run(out, next_tok=7))
    assert eco[0].finish_reason == "stop"
    assert eco[0].stop_reason == 7


def test_min_tokens_overrides_stop():
    sched = make_scheduler()
    req = Request("a", [1, 2, 3],
                  SamplingParams(max_tokens=8, min_tokens=3,
                                 stop_token_ids=[7]))
    sched.add_request(req)
    out = sched.schedule()
    eco = sched.update_from_output(out, fake_run(out, next_tok=7))
    assert eco[0].finish_reason is None  # min_tokens not reached


def test_preemption_recompute():
    # tiny pool: 8 usable blocks of 4 tokens = 32 slots
    sched = make_scheduler(num_blocks=9, caching=False)
    a = make_req("a", 14, max_tokens=32)
    b = make_req("b", 14, max_tokens=32)
    sched.add_request(a)
    sched.add_request(b)
    out = sched.schedule()
    sched.update_from_output(out, fake_run(out))
    # both running, 4+4 blocks used; next decode steps force growth
    preempted = False
    for _ in range(12):
        out = sched.schedule()
        if out.is_empty:
            break
        sched.update_from_output(out, fake_run(out))
        if sched.num_preemptions > 0:
            preempted = True
            break
    assert preempted
    # preempted request is at the head of waiting with reset progress
    assert sched.waiting[0].num_computed_tokens == 0
    assert sched.waiting[0].status == RequestStatus.PREEMPTED
    # engine can still make progress and re-admit it
    for _ in range(50):
        out = sched.schedule()
        if out.is_empty:
            break
        sched.update_from_output(out, fake_run(out))
        if not sched.has_unfinished_requests():
            break


def test_prefix_cache_reduces_scheduled_tokens():
    sched = make_scheduler()
    a = make_req("a", 16, max_tokens=1)
    sched.add_request(a)
    out = sched.schedule()
    sched.update_from_output(out, fake_run(out))
    assert not sched.has_unfinished_requests()
    b = Request("b", list(range(16)), SamplingParams(max_tokens=1))
    sched.add_request(b)
    out = sched.schedule()
    # 3 of 4 blocks hit (full-hit trimmed by design elsewhere; here the
    # 4th block is full and cached since 16 tokens + 1 generated)
    assert out.num_scheduled_tokens["b"] < 16
    assert out.num_cached_tokens >= 12


def test_abort():
    sched = make_scheduler()
    sched.add_request(make_req("a", 8))
    out = sched.schedule()
    sched.finish_requests("a", RequestStatus.FINISHED_ABORTED)
    assert not sched.has_unfinished_requests()


def test_finished_req_ids_relayed():
    sched = make_scheduler()
    req = make_req("a", 4, max_tokens=1)
    sched.add_request(req)
    out = sched.schedule()
    sched.update_from_output(out, fake_run(out))
    out2 = sched.schedule()
    assert "a" in out2.finished_req_ids


def test_priority_scheduling():
    """Lower priority value admits first; preemption evicts the least
    important (reference V0 priority mode)."""
    from vllm_pq_tpu.config import CacheConfig, SchedulerConfig
    from vllm_pq_tpu.core.scheduler import Scheduler
    from vllm_pq_tpu.request import Request
    from vllm_pq_tpu.sampling_params import SamplingParams

    sched = Scheduler(SchedulerConfig(max_num_seqs=2,
                                      max_num_batched_tokens=64,
                                      max_model_len=64),
                      CacheConfig(block_size=16,
                                  enable_prefix_caching=False), 32)
    sp = SamplingParams(max_tokens=8)
    lo = Request("low", list(range(8)), sp, priority=5, arrival_time=1.0)
    hi = Request("high", list(range(8)), sp, priority=0, arrival_time=2.0)
    sched.add_request(lo)
    sched.add_request(hi)
    out = sched.schedule()
    ids = [r.req_id for r in out.scheduled_new_reqs]
    # both fit, but the high-priority one is admitted first
    assert ids[0] == "high"


def test_priority_force_preemption():
    """A blocked higher-priority arrival force-preempts the worst
    running request (reference V0 _schedule_priority_preemption,
    core/scheduler.py:952)."""
    from vllm_pq_tpu.config import CacheConfig, SchedulerConfig
    from vllm_pq_tpu.core.scheduler import Scheduler
    from vllm_pq_tpu.core.scheduler_output import ModelRunnerOutput
    from vllm_pq_tpu.request import Request
    from vllm_pq_tpu.sampling_params import SamplingParams

    # max_num_seqs=2: seq slots are the contended resource
    sched = Scheduler(SchedulerConfig(max_num_seqs=2,
                                      max_num_batched_tokens=64,
                                      max_model_len=64),
                      CacheConfig(block_size=16,
                                  enable_prefix_caching=False), 32)
    sp = SamplingParams(max_tokens=8, ignore_eos=True)
    lo1 = Request("lo1", list(range(8)), sp, priority=5, arrival_time=1.0)
    lo2 = Request("lo2", list(range(8)), sp, priority=7, arrival_time=2.0)
    sched.add_request(lo1)
    sched.add_request(lo2)
    out = sched.schedule()
    ro = ModelRunnerOutput()
    for r in out.scheduled_new_reqs:
        ro.req_ids.append(r.req_id)
        ro.sampled_token_ids[r.req_id] = [1]
    sched.update_from_output(out, ro)
    assert len(sched.running) == 2

    hi = Request("hi", list(range(8)), sp, priority=0, arrival_time=3.0)
    sched.add_request(hi)
    out2 = sched.schedule()
    # the worst-priority running request (lo2) was evicted; hi admitted
    new_ids = [r.req_id for r in out2.scheduled_new_reqs]
    assert "hi" in new_ids
    running_ids = {r.request_id for r in sched.running}
    assert "lo2" not in running_ids and "lo1" in running_ids
    assert any(r.request_id == "lo2" for r in sched.waiting)
    assert sched.num_preemptions == 1
