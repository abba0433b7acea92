"""CLI: ``python -m vllm_pq_tpu.entrypoints.cli {serve,complete,chat}``
(role of reference ``vllm serve/complete/chat``, cli/main.py:11)."""

import argparse
import json
import sys


def cmd_serve(argv):
    from vllm_pq_tpu.entrypoints.openai.api_server import (make_arg_parser,
                                                           run_server)
    parser = make_arg_parser()
    # allow positional model like `vllm serve MODEL`
    parser.add_argument("model_pos", nargs="?", default=None)
    args = parser.parse_args(argv)
    if args.model_pos:
        args.model = args.model_pos
    run_server(args)


def _client(args):
    import urllib.request

    def post(path, payload):
        req = urllib.request.Request(
            f"{args.url}{path}", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            return json.loads(r.read())
    return post


def cmd_complete(argv):
    p = argparse.ArgumentParser("complete")
    p.add_argument("--url", default="http://localhost:8000")
    p.add_argument("--model", default="default")
    p.add_argument("--max-tokens", type=int, default=32)
    p.add_argument("prompt", nargs="*")
    args = p.parse_args(argv)
    post = _client(args)
    prompt = " ".join(args.prompt) or sys.stdin.read()
    out = post("/v1/completions", {"model": args.model, "prompt": prompt,
                                   "max_tokens": args.max_tokens})
    print(out["choices"][0]["text"])


def cmd_chat(argv):
    p = argparse.ArgumentParser("chat")
    p.add_argument("--url", default="http://localhost:8000")
    p.add_argument("--model", default="default")
    p.add_argument("--max-tokens", type=int, default=128)
    args = p.parse_args(argv)
    post = _client(args)
    history = []
    print("interactive chat; ctrl-d to exit")
    while True:
        try:
            user = input("> ")
        except EOFError:
            break
        history.append({"role": "user", "content": user})
        out = post("/v1/chat/completions",
                   {"model": args.model, "messages": history,
                    "max_tokens": args.max_tokens})
        reply = out["choices"][0]["message"]["content"]
        history.append({"role": "assistant", "content": reply})
        print(reply)


def main():
    cmds = {"serve": cmd_serve, "complete": cmd_complete, "chat": cmd_chat}
    if len(sys.argv) < 2 or sys.argv[1] not in cmds:
        print(f"usage: vllm_pq_tpu {{{','.join(cmds)}}} ...",
              file=sys.stderr)
        sys.exit(2)
    cmds[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    main()
