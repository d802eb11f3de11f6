"""Ogg demuxer + Vorbis header parsing (documented-decode-gap row;
fyrox-sound/Cargo.toml:26 symphonia)."""
import struct

import pytest

from fyrox_tpu.sound.ogg import (UnsupportedCodec, decode, read_packets,
                                 read_pages, vorbis_info)


def _crc_page(htype, granule, serial, seq, segments):
    """Build an Ogg page (CRC left zero — our reader doesn't verify)."""
    lacing = b""
    body = b""
    for seg in segments:
        n = len(seg)
        while n >= 255:
            lacing += bytes([255])
            n -= 255
        lacing += bytes([n])
        body += seg
    head = b"OggS" + struct.pack("<BBqIIIB", 0, htype, granule, serial,
                                 seq, 0, len(lacing))
    return head + lacing + body


def _vorbis_stream():
    ident = (b"\x01vorbis" + struct.pack("<IBIiii", 0, 2, 44100,
                                         0, 128000, 0) + b"\x01")
    comment_body = b"test-vendor"
    comments = [b"TITLE=Song", b"ARTIST=Band"]
    c = b"\x03vorbis" + struct.pack("<I", len(comment_body)) + comment_body
    c += struct.pack("<I", len(comments))
    for entry in comments:
        c += struct.pack("<I", len(entry)) + entry
    c += b"\x01"
    p0 = _crc_page(0x02, 0, 7, 0, [ident])
    p1 = _crc_page(0x00, 0, 7, 1, [c])
    return p0 + p1


class TestOgg:
    def test_pages_and_packets(self):
        data = _vorbis_stream()
        pages = read_pages(data)
        assert len(pages) == 2 and pages[0].is_bos is True
        pkts = read_packets(pages)
        assert pkts[0][:7] == b"\x01vorbis"

    def test_long_packet_reassembly(self):
        big = bytes(600)                      # 255+255+90 lacing
        page = _crc_page(0, 0, 1, 0, [big])
        pkts = read_packets(read_pages(page))
        assert len(pkts) == 1 and len(pkts[0]) == 600

    def test_vorbis_info(self):
        info = vorbis_info(_vorbis_stream())
        assert info.channels == 2 and info.sample_rate == 44100
        assert info.comments["TITLE"] == "Song"
        assert info.vendor == "test-vendor"

    def test_decode_rejects_headers_only_stream(self):
        # ident + comment but no setup header / audio packets
        with pytest.raises(ValueError, match="truncated"):
            decode(_vorbis_stream())

    def test_non_vorbis_rejected(self):
        with pytest.raises(ValueError):
            vorbis_info(b"OggS" + bytes(60))
