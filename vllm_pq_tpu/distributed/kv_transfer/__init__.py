from vllm_pq_tpu.distributed.kv_transfer.connector import (  # noqa: F401
    InprocPipe, KVConnector, KVLookupBuffer, ZmqKVPipe, prompt_key)
