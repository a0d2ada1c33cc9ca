#!/usr/bin/env python
"""Example: real-time streaming embedding extraction.

Simulates a live audio source (a synthesized chirp delivered in ~100 ms
chunks) and embeds it incrementally two ways:

  1. In-process: `embed.StreamingEmbedder` over a resident extractor.
  2. Over HTTP: the /v1/stream/{open,feed,flush} session endpoints, with
     the server started in-process.

Both produce rows identical to embedding the complete clip at once
(printed as a max row-difference at the end). tiny_L3 with random
weights by default so it runs anywhere; pass a checkpoint + model type
for the real thing.

    python examples/stream_embeddings.py                      # smoke
    python examples/stream_embeddings.py model.ckpt cnn_L3_melspec2
"""

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def synth_source(sr: int, seconds: float, chunk_s: float = 0.1):
    """A chirp, yielded in live-capture-sized chunks."""
    t = np.arange(int(seconds * sr)) / sr
    audio = (0.3 * np.sin(2 * np.pi * (200 + 400 * t) * t)).astype(
        np.float32
    )
    step = int(chunk_s * sr)
    for i in range(0, len(audio), step):
        yield audio[i:i + step]
    return


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", nargs="?", default=None)
    p.add_argument("model_type", nargs="?", default="tiny_L3")
    p.add_argument("--pooling", default="original")
    p.add_argument("--seconds", type=float, default=2.5)
    p.add_argument("--hop", type=float, default=0.1)
    args = p.parse_args()

    from l3embedding_tpu.embed import EmbeddingExtractor, StreamingEmbedder
    from l3embedding_tpu.embed.http_serve import (
        make_server,
        serve_forever_in_thread,
    )

    ex = EmbeddingExtractor(args.checkpoint, args.model_type, args.pooling)
    clip = np.concatenate(list(synth_source(ex.sr, args.seconds)))

    # 1. In-process streaming.
    stream = StreamingEmbedder(ex, hop_size=args.hop)
    rows = [stream.feed(chunk) for chunk in synth_source(ex.sr, args.seconds)]
    rows.append(stream.flush())
    local = np.concatenate([r for r in rows if r.size], axis=0)
    print(f"in-process: {local.shape[0]} rows of dim {local.shape[1]} "
          f"from {args.seconds}s of live chunks")

    # 2. The same stream over the HTTP session API.
    server = make_server(ex, port=0)
    serve_forever_in_thread(server)
    host, port = server.server_address
    base = f"http://{host}:{port}"

    def post(path, data=b"", headers=None):
        req = urllib.request.Request(base + path, data=data,
                                     headers=headers or {})
        return urllib.request.urlopen(req)

    try:
        with post("/v1/stream/open",
                  json.dumps({"hop": args.hop}).encode()) as r:
            sid = json.load(r)["stream_id"]
        http_rows = []
        for chunk in synth_source(ex.sr, args.seconds):
            with post(f"/v1/stream/{sid}/feed",
                      chunk.astype("<f4").tobytes()) as r:
                k = int(r.headers["X-Num-Windows"])
                if k:
                    http_rows.append(
                        np.frombuffer(r.read(), "<f4").reshape(k, -1)
                    )
        with post(f"/v1/stream/{sid}/flush") as r:
            k = int(r.headers["X-Num-Windows"])
            if k:
                http_rows.append(
                    np.frombuffer(r.read(), "<f4").reshape(k, -1)
                )
        remote = np.concatenate(http_rows, axis=0)
        print(f"HTTP session: {remote.shape[0]} rows")
    finally:
        server.shutdown()
        server.l3_service.close()

    whole = ex.embed_audio(clip, hop_size=args.hop)
    print(f"vs whole-clip extraction: shapes {local.shape} == {whole.shape},"
          f" max |diff| in-process {np.abs(local - whole).max():.2e},"
          f" HTTP {np.abs(remote - whole).max():.2e}")


if __name__ == "__main__":
    main()
