"""TensorBoard event-writer tests: wire-format level (CRC, framing, proto
fields) so the files are verifiably readable by TensorBoard without
installing it."""

import struct

import numpy as np
import pytest

from pytorch_wavenet_tpu.utils.tensorboard import (
    SummaryWriter,
    crc32c,
    masked_crc32c,
    encode_png,
    encode_wav,
)


def test_crc32c_known_vectors():
    # standard CRC32C test vectors
    assert crc32c(b"") == 0x0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"a") == 0xC1D04330


def _read_records(path):
    records = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        (length,) = struct.unpack("<Q", data[pos : pos + 8])
        (len_crc,) = struct.unpack("<I", data[pos + 8 : pos + 12])
        assert len_crc == masked_crc32c(data[pos : pos + 8])
        payload = data[pos + 12 : pos + 12 + length]
        (crc,) = struct.unpack("<I", data[pos + 12 + length : pos + 16 + length])
        assert crc == masked_crc32c(payload)
        records.append(payload)
        pos += 16 + length
    return records


def _parse_fields(msg):
    """Minimal proto wire parser -> {field: [values]}."""
    fields = {}
    pos = 0
    while pos < len(msg):
        key = 0
        shift = 0
        while True:
            b = msg[pos]
            pos += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = key >> 3, key & 7
        if wire == 0:
            val = 0
            shift = 0
            while True:
                b = msg[pos]
                pos += 1
                val |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            val = struct.unpack("<d", msg[pos : pos + 8])[0]
            pos += 8
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = msg[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            val = msg[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = struct.unpack("<f", msg[pos : pos + 4])[0]
            pos += 4
        else:
            raise ValueError(f"wire {wire}")
        fields.setdefault(field, []).append(val)
    return fields


def test_event_file_structure(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 3.25, step=7)
    w.add_histogram("weights", np.random.default_rng(0).normal(size=100), step=7)
    w.add_audio("clip", np.sin(np.arange(800) * 0.1), step=7, sample_rate=16000)
    w.add_image("img", np.zeros((8, 8), np.uint8), step=7)
    w.close()

    records = _read_records(w.path)
    assert len(records) == 5

    # record 0: file_version event
    ev0 = _parse_fields(records[0])
    assert ev0[3][0] == b"brain.Event:2"

    # record 1: scalar summary
    ev1 = _parse_fields(records[1])
    assert ev1[2][0] == 7  # step
    summary = _parse_fields(ev1[5][0])
    value = _parse_fields(summary[1][0])
    assert value[1][0] == b"loss"
    assert value[2][0] == pytest.approx(3.25)

    # record 2: histogram with packed buckets
    hist_value = _parse_fields(_parse_fields(_parse_fields(records[2])[5][0])[1][0])
    assert hist_value[1][0] == b"weights"
    histo = _parse_fields(hist_value[5][0])
    assert histo[3][0] == pytest.approx(100.0)  # num
    n_limits = len(histo[6][0]) // 8
    n_counts = len(histo[7][0]) // 8
    assert n_limits == n_counts == 200

    # record 3: audio with WAV payload
    audio_value = _parse_fields(_parse_fields(_parse_fields(records[3])[5][0])[1][0])
    audio = _parse_fields(audio_value[6][0])
    assert audio[1][0] == pytest.approx(16000.0)
    assert audio[4][0][:4] == b"RIFF"
    assert audio[5][0] == b"audio/wav"

    # record 4: image with PNG payload
    img_value = _parse_fields(_parse_fields(_parse_fields(records[4])[5][0])[1][0])
    img = _parse_fields(img_value[4][0])
    assert img[4][0][:8] == b"\x89PNG\r\n\x1a\n"


def test_png_decodable():
    png = encode_png(np.arange(64, dtype=np.uint8).reshape(8, 8))
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR dims
    w, h = struct.unpack(">II", png[16:24])
    assert (w, h) == (8, 8)


def test_wav_bytes_parse():
    import io
    import wave

    blob = encode_wav(np.sin(np.arange(1600) * 0.1), 16000)
    with wave.open(io.BytesIO(blob)) as f:
        assert f.getframerate() == 16000
        assert f.getnframes() == 1600


def test_log_audio_through_cadence(tmp_path):
    """The generate_function signature is f(step) at BOTH call sites: the
    cadenced daemon-thread generate hook and log_audio (round 1 had
    log_audio calling it with no args, so one of the two always
    TypeErrored)."""
    from pytorch_wavenet_tpu.utils.logging import TensorboardLogger

    calls = []

    def gen(step):
        calls.append(step)
        return np.sin(np.arange(800) * 0.05)[None, :]

    lg = TensorboardLogger(
        log_interval=10**9, validation_interval=10**9, generate_interval=2,
        generate_function=gen, log_dir=str(tmp_path),
    )
    lg.log_audio(7)
    assert calls == [7]

    # cadence hook spawns the same callable on a daemon thread
    lg.log(2, 0.0)
    if lg.generate_thread is not None:
        lg.generate_thread.join(timeout=10)
    assert calls == [7, 2]
    lg.close()

    records = _read_records(lg.writer.path)
    audio_value = _parse_fields(_parse_fields(_parse_fields(records[1])[5][0])[1][0])
    audio = _parse_fields(audio_value[6][0])
    assert audio[5][0] == b"audio/wav"
