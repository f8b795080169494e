"""TensorBoard event-file writer: wire-format correctness
(utils/tb_events.py vs the real protobuf/TFRecord definitions)."""

import struct

import numpy as np
import pytest

from das_tpu.utils.tb_events import (EventWriter, _event, _masked_crc,
                                     _scalar_summary, crc32c)


def test_crc32c_standard_vector():
    # the canonical CRC-32C check value
    assert crc32c(b'123456789') == 0xE3069283
    assert crc32c(b'') == 0


def _read_records(path):
    data = open(path, 'rb').read()
    off, recs = 0, []
    while off < len(data):
        header = data[off:off + 8]
        (ln,) = struct.unpack('<Q', header)
        (hcrc,) = struct.unpack('<I', data[off + 8:off + 12])
        assert hcrc == _masked_crc(header)
        payload = data[off + 12:off + 12 + ln]
        (pcrc,) = struct.unpack('<I',
                                data[off + 12 + ln:off + 16 + ln])
        assert pcrc == _masked_crc(payload)
        recs.append(payload)
        off += 16 + ln
    return recs


def test_event_file_roundtrip(tmp_path):
    event_pb2 = pytest.importorskip('tensorboard.compat.proto.event_pb2')

    w = EventWriter(str(tmp_path))
    w.add_scalars(3, {'train/loss': 3.5, 'train/lr': 2e-3})
    w.add_scalars(4, {'train/loss': -1.25})
    w.close()

    recs = _read_records(w.path)
    assert len(recs) == 3

    e0 = event_pb2.Event()
    e0.ParseFromString(recs[0])
    assert e0.file_version == 'brain.Event:2'

    e1 = event_pb2.Event()
    e1.ParseFromString(recs[1])
    assert e1.step == 3
    got = {v.tag: v.simple_value for v in e1.summary.value}
    np.testing.assert_allclose(got['train/loss'], 3.5)
    np.testing.assert_allclose(got['train/lr'], 2e-3, rtol=1e-6)

    e2 = event_pb2.Event()
    e2.ParseFromString(recs[2])
    assert e2.step == 4
    assert e2.summary.value[0].simple_value == -1.25


def test_encoding_matches_protobuf():
    event_pb2 = pytest.importorskip('tensorboard.compat.proto.event_pb2')

    ref = event_pb2.Event()
    ref.wall_time = 123.25
    ref.step = 77
    v = ref.summary.value.add()
    v.tag = 'm'
    v.simple_value = 0.5
    ours = _event(123.25, step=77, summary=_scalar_summary({'m': 0.5}))
    assert ours == ref.SerializeToString()
