"""OpenTelemetry request tracing (role of reference ``vllm/tracing.py``):
one span per finished request with queue/prefill/decode timing
attributes, exported over OTLP when ``--otlp-traces-endpoint`` is set.
Degrades to a no-op when the opentelemetry packages are absent (this
image does not ship them)."""

from typing import Mapping, Optional

from vllm_pq_tpu.logger import init_logger

logger = init_logger(__name__)

TRACE_HEADERS = ["traceparent", "tracestate"]


class SpanAttributes:
    GEN_AI_USAGE_PROMPT_TOKENS = "gen_ai.usage.prompt_tokens"
    GEN_AI_USAGE_COMPLETION_TOKENS = "gen_ai.usage.completion_tokens"
    GEN_AI_LATENCY_TIME_IN_QUEUE = "gen_ai.latency.time_in_queue"
    GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN = \
        "gen_ai.latency.time_to_first_token"
    GEN_AI_LATENCY_E2E = "gen_ai.latency.e2e"
    GEN_AI_REQUEST_ID = "gen_ai.request.id"
    GEN_AI_REQUEST_TEMPERATURE = "gen_ai.request.temperature"
    GEN_AI_REQUEST_MAX_TOKENS = "gen_ai.request.max_tokens"
    GEN_AI_REQUEST_N = "gen_ai.request.n"


_tracer = None


def init_tracer(instrumenting_module: str,
                otlp_endpoint: Optional[str]):
    """Returns a tracer or None (no-op) when OTel is unavailable."""
    global _tracer
    if otlp_endpoint is None:
        return None
    try:
        from opentelemetry import trace
        from opentelemetry.exporter.otlp.proto.grpc.trace_exporter \
            import OTLPSpanExporter
        from opentelemetry.sdk.trace import TracerProvider
        from opentelemetry.sdk.trace.export import BatchSpanProcessor
        provider = TracerProvider()
        provider.add_span_processor(BatchSpanProcessor(
            OTLPSpanExporter(endpoint=otlp_endpoint)))
        trace.set_tracer_provider(provider)
        _tracer = trace.get_tracer(instrumenting_module)
        return _tracer
    except Exception as e:  # noqa: BLE001
        logger.warning("OpenTelemetry unavailable (%s); tracing disabled",
                       e)
        return None


def extract_trace_context(headers: Optional[Mapping[str, str]]):
    """Parent context from HTTP traceparent headers, or None."""
    if not headers:
        return None
    try:
        from opentelemetry.trace.propagation.tracecontext import \
            TraceContextTextMapPropagator
        return TraceContextTextMapPropagator().extract(carrier=headers)
    except Exception:  # noqa: BLE001
        return None


def trace_request_done(tracer, request, queue_s: float, ttft_s: float,
                       e2e_s: float, prompt_tokens: int,
                       completion_tokens: int,
                       parent_ctx=None) -> None:
    """Emit one llm_request span (called by the stats logger when a
    request finishes)."""
    if tracer is None:
        return
    try:
        with tracer.start_as_current_span(
                "llm_request", context=parent_ctx) as span:
            sp = request.sampling_params
            span.set_attribute(SpanAttributes.GEN_AI_REQUEST_ID,
                               request.request_id)
            span.set_attribute(
                SpanAttributes.GEN_AI_USAGE_PROMPT_TOKENS, prompt_tokens)
            span.set_attribute(
                SpanAttributes.GEN_AI_USAGE_COMPLETION_TOKENS,
                completion_tokens)
            span.set_attribute(
                SpanAttributes.GEN_AI_LATENCY_TIME_IN_QUEUE, queue_s)
            span.set_attribute(
                SpanAttributes.GEN_AI_LATENCY_TIME_TO_FIRST_TOKEN, ttft_s)
            span.set_attribute(SpanAttributes.GEN_AI_LATENCY_E2E, e2e_s)
            span.set_attribute(SpanAttributes.GEN_AI_REQUEST_TEMPERATURE,
                               sp.temperature)
            span.set_attribute(SpanAttributes.GEN_AI_REQUEST_N, sp.n)
            if sp.max_tokens is not None:
                span.set_attribute(
                    SpanAttributes.GEN_AI_REQUEST_MAX_TOKENS,
                    sp.max_tokens)
    except Exception:  # noqa: BLE001
        pass
