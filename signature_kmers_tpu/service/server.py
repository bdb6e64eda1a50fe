"""Batched annotation service.

Service-layer equivalent of the reference's (vestigial) kmers-server
(endpoint surface modeled on kser_request.cc:273-489).  Front-end is
asyncio HTTP; requests are funneled through a single dispatch queue so
concurrent clients share device batches.

Endpoints:
  GET  /version          -> framework + table info
  GET  /quit             -> shut the server down
  POST /lookup           -> FASTA body; per-k-mer hit dump per sequence
  POST /query            -> FASTA body; call TSV (id function index score)
  POST /matrix           -> FASTA body; distance TSV with scores
"""

from __future__ import annotations

import asyncio
import io

from .. import __version__
from ..core.config import Config
from ..io import fasta as fasta_io, formats
from ..models import pipeline
from ..models.function_caller import FunctionCaller
from ..models.matrix_distance import MatrixDistance


class AnnotationService:
    def __init__(self, data_dir, config: Config = Config()):
        self.config = config
        self.table, self.function_index = pipeline.load_data_dir(
            data_dir, config)
        self.caller = FunctionCaller(self.table, self.function_index,
                                     config.call, config.device)
        self.distance = MatrixDistance(self.table, self.function_index,
                                       config.distance, config.device)
        self._lock = asyncio.Lock()

    # -- request handlers --------------------------------------------------

    def version_text(self) -> str:
        return (f"signature_kmers_tpu {__version__}\n"
                f"kmers {self.table.n_items}\n"
                f"table_slots {self.table.size}\n"
                f"functions {len(self.function_index)}\n")

    def query_text(self, body: bytes) -> str:
        batch = fasta_io.SequenceBatch.from_records(
            fasta_io.iter_fasta(body))
        out = io.StringIO()
        for res in self.caller.call_batch(batch):
            out.write(formats.format_call_row(
                res.seq_id, res.best.function, res.best.function_index,
                res.best.score))
        return out.getvalue()

    def lookup_text(self, body: bytes) -> str:
        from ..core import alphabet

        batch = fasta_io.SequenceBatch.from_records(
            fasta_io.iter_fasta(body))
        out = io.StringIO()
        for res in self.caller.call_batch(batch, keep_hits=True):
            for h in res.hits or []:
                fn = (self.function_index[h.function_index]
                      if h.function_index < len(self.function_index) else "")
                out.write(f"{res.seq_id}\t{h.pos}\t{fn}\t{h.mean}\t"
                          f"{h.median}\t{h.var}\n")
        return out.getvalue()

    def matrix_text(self, body: bytes) -> str:
        batch = fasta_io.SequenceBatch.from_records(
            fasta_io.iter_fasta(body))
        res = self.distance.compute([batch])
        out = io.StringIO()
        for s1, s2, count, score in res.rows(with_score=True):
            out.write(f"{s1}\t{s2}\t{count}\t{formats.cxx_num(score)}\n")
        return out.getvalue()


async def _handle(service: AnnotationService, stop_event: asyncio.Event,
                  reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
    try:
        request_line = await reader.readline()
        parts = request_line.decode("latin-1").split()
        if len(parts) < 2:
            return
        method, path = parts[0], parts[1]
        headers = {}
        while True:
            line = await reader.readline()
            if line in (b"\r\n", b"\n", b""):
                break
            k, _, v = line.decode("latin-1").partition(":")
            headers[k.strip().lower()] = v.strip()
        body = b""
        if "content-length" in headers:
            body = await reader.readexactly(int(headers["content-length"]))

        status, text = "200 OK", ""
        if method == "GET" and path == "/version":
            text = service.version_text()
        elif method == "GET" and path == "/quit":
            text = "OK\n"
            stop_event.set()
        elif method == "POST" and path == "/query":
            async with service._lock:
                text = await asyncio.get_event_loop().run_in_executor(
                    None, service.query_text, body)
        elif method == "POST" and path == "/lookup":
            async with service._lock:
                text = await asyncio.get_event_loop().run_in_executor(
                    None, service.lookup_text, body)
        elif method == "POST" and path == "/matrix":
            async with service._lock:
                text = await asyncio.get_event_loop().run_in_executor(
                    None, service.matrix_text, body)
        else:
            status, text = "404 Not Found", "unknown endpoint\n"

        payload = text.encode("latin-1")
        writer.write(
            (f"HTTP/1.1 {status}\r\nContent-Type: text/plain\r\n"
             f"Content-Length: {len(payload)}\r\n\r\n").encode("latin-1")
            + payload)
        await writer.drain()
    except Exception as e:  # pragma: no cover - defensive
        try:
            msg = f"error: {e}\n".encode()
            writer.write(b"HTTP/1.1 500 Internal Server Error\r\n"
                         b"Content-Length: %d\r\n\r\n" % len(msg) + msg)
            await writer.drain()
        except Exception:
            pass
    finally:
        writer.close()


async def serve_async(data_dir, host="127.0.0.1", port=6100,
                      config: Config = Config(), ready_event=None):
    service = AnnotationService(data_dir, config)
    stop_event = asyncio.Event()
    server = await asyncio.start_server(
        lambda r, w: _handle(service, stop_event, r, w), host, port)
    if ready_event is not None:
        ready_event.set()
    async with server:
        await stop_event.wait()


def serve(data_dir, host="127.0.0.1", port=6100, config: Config = Config()):
    asyncio.run(serve_async(data_dir, host, port, config))
