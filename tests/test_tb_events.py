"""TensorBoard event-writer tests: TFRecord framing (masked CRC-32C),
protobuf field round-trip via a minimal independent parser, and the
MetricsWriter integration."""

import struct

import numpy as np

from retinanet_tpu.utils.tb_events import (
    TBEventWriter, _crc32c, _masked_crc, _varint)


def test_crc32c_known_vector():
    # The canonical CRC-32C check value (RFC 3720 appendix B.4).
    assert _crc32c(b"123456789") == 0xE3069283


def _read_records(path):
    """Independent TFRecord reader with CRC verification."""
    records = []
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if not header:
                break
            (length,) = struct.unpack("<Q", header)
            (hcrc,) = struct.unpack("<I", f.read(4))
            assert hcrc == _masked_crc(header)
            payload = f.read(length)
            (pcrc,) = struct.unpack("<I", f.read(4))
            assert pcrc == _masked_crc(payload)
            records.append(payload)
    return records


def _parse_fields(buf):
    """Minimal protobuf parser: {field: [values]} (varint/fixed/bytes)."""
    out = {}
    i = 0
    while i < len(buf):
        tag = 0
        shift = 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wire == 1:
            (v,) = struct.unpack("<d", buf[i:i + 8])
            i += 8
        elif wire == 5:
            (v,) = struct.unpack("<f", buf[i:i + 4])
            i += 4
        elif wire == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[i:i + ln]
            i += ln
        else:
            raise AssertionError(f"unexpected wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def test_event_file_roundtrip(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalar("loss/total", 1.5, step=7)
    w.add_histogram_counts("prob_fg_hist", [1.0, 2.0, 3.0],
                           [0.33, 0.66, 1.0], step=7)
    w.add_image_png("img/x", b"\x89PNGfake", 4, 6, step=8)
    w.close()

    records = _read_records(w.path)
    assert len(records) == 4  # file_version + 3 events

    head = _parse_fields(records[0])
    assert head[3] == [b"brain.Event:2"]  # Event.file_version

    ev = _parse_fields(records[1])
    assert ev[2] == [7]  # Event.step
    value = _parse_fields(_parse_fields(ev[5][0])[1][0])  # Summary.Value
    assert value[1] == [b"loss/total"]
    assert value[2][0] == np.float32(1.5)

    hist_val = _parse_fields(_parse_fields(_parse_fields(
        records[2])[5][0])[1][0])
    histo = _parse_fields(hist_val[5][0])
    assert histo[3] == [6.0]  # HistogramProto.num = total count
    limits = np.frombuffer(histo[6][0], "<f8")
    counts = np.frombuffer(histo[7][0], "<f8")
    np.testing.assert_allclose(limits, [0.33, 0.66, 1.0])
    np.testing.assert_allclose(counts, [1.0, 2.0, 3.0])

    img_val = _parse_fields(_parse_fields(_parse_fields(
        records[3])[5][0])[1][0])
    image = _parse_fields(img_val[4][0])
    assert image[1] == [4] and image[2] == [6]
    assert image[4] == [b"\x89PNGfake"]


def test_metrics_writer_emits_tb_events(tmp_path):
    from retinanet_tpu.utils.summaries import MetricsWriter
    import glob

    w = MetricsWriter(str(tmp_path))
    w.write(3, {"total_loss": 0.5,
                "prob_fg_hist": np.arange(20, dtype=np.float32)})
    w.close()
    events = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(events) == 1
    records = _read_records(events[0])
    assert len(records) == 3  # version + scalars event + histogram event
    # JSONL still written alongside.
    assert (tmp_path / "metrics.jsonl").exists()
