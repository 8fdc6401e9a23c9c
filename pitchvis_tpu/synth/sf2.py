"""Minimal SoundFont 2 (SF2) reader.

Covers the subset of the format the training pipeline uses from the
reference's vendored rustysynth (rustysynth_fork/src/soundfont.rs and
friends): RIFF parsing, 16-bit sample data, preset/instrument zone
resolution (key/velocity ranges, root key, tuning, loop points, volume
envelope attack/release), mapping bank/program + key -> playable sample
regions. Modulators and the full generator set are intentionally out of
scope; unknown generators are preserved in the zone dicts for callers.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

# generator ids (SF2 spec §8.1.2)
GEN_START_ADDRS_OFFSET = 0
GEN_END_ADDRS_OFFSET = 1
GEN_STARTLOOP_OFFSET = 2
GEN_ENDLOOP_OFFSET = 3
GEN_ATTACK_VOL_ENV = 34
GEN_RELEASE_VOL_ENV = 38
GEN_INSTRUMENT = 41
GEN_KEY_RANGE = 43
GEN_VEL_RANGE = 44
GEN_INITIAL_ATTENUATION = 48
GEN_COARSE_TUNE = 51
GEN_FINE_TUNE = 52
GEN_SAMPLE_ID = 53
GEN_SAMPLE_MODES = 54
GEN_OVERRIDING_ROOT_KEY = 58


@dataclass
class SampleHeader:
    name: str
    start: int
    end: int
    start_loop: int
    end_loop: int
    sample_rate: int
    original_pitch: int
    pitch_correction: int


@dataclass
class Region:
    """One playable zone: instrument generators merged over preset zone."""

    sample: SampleHeader
    key_lo: int = 0
    key_hi: int = 127
    vel_lo: int = 0
    vel_hi: int = 127
    root_key: int | None = None
    sample_modes: int = 0  # 1/3 = loop
    attack_secs: float = 0.001
    release_secs: float = 0.05
    attenuation_cb: int = 0  # centibels
    coarse_tune: int = 0
    fine_tune: int = 0
    generators: dict = field(default_factory=dict)

    def contains(self, key: int, velocity: int) -> bool:
        return self.key_lo <= key <= self.key_hi and self.vel_lo <= velocity <= self.vel_hi

    @property
    def loops(self) -> bool:
        return self.sample_modes in (1, 3)

    def pitch_ratio(self, key: int) -> float:
        root = self.root_key if self.root_key is not None else self.sample.original_pitch
        cents = (
            (key - root) * 100
            + self.coarse_tune * 100
            + self.fine_tune
            + self.sample.pitch_correction
        )
        return 2.0 ** (cents / 1200.0)


@dataclass
class Preset:
    name: str
    bank: int
    program: int
    regions: list[Region] = field(default_factory=list)


def _timecents_to_secs(tc: int) -> float:
    return 2.0 ** (tc / 1200.0)


class SoundFont:
    """Parsed SF2: `samples` (float32 mono array) + presets by
    (bank, program)."""

    def __init__(self, data: bytes):
        self.samples, chunks = _parse_riff(data)
        self.presets: dict[tuple[int, int], Preset] = {}
        self._build(chunks)

    @classmethod
    def from_file(cls, path: str) -> "SoundFont":
        with open(path, "rb") as f:
            return cls(f.read())

    def preset(self, bank: int, program: int) -> Preset | None:
        return self.presets.get((bank, program)) or (
            self.presets.get((bank, 0)) if bank == 128 else self.presets.get((0, program))
        )

    def regions_for(self, bank: int, program: int, key: int, velocity: int) -> list[Region]:
        p = self.preset(bank, program)
        if p is None and self.presets:
            p = next(iter(self.presets.values()))
        if p is None:
            return []
        return [r for r in p.regions if r.contains(key, velocity)]

    # -- construction ---------------------------------------------------------
    def _build(self, c: dict) -> None:
        shdr = c["shdr"]
        sample_headers = []
        for off in range(0, len(shdr) - 46, 46):
            name = shdr[off : off + 20].split(b"\0")[0].decode("ascii", "replace")
            s, e, sl, el, sr = struct.unpack_from("<IIIII", shdr, off + 20)
            pitch, corr = struct.unpack_from("<Bb", shdr, off + 40)
            sample_headers.append(
                SampleHeader(name, s, e, sl, el, sr, pitch, corr)
            )

        # instruments: name + zone ranges into ibag
        inst = c["inst"]
        instruments = []
        for off in range(0, len(inst) - 22, 22):
            name = inst[off : off + 20].split(b"\0")[0].decode("ascii", "replace")
            (bag_idx,) = struct.unpack_from("<H", inst, off + 20)
            instruments.append((name, bag_idx))
        inst_bag_bounds = [
            (instruments[i][1], instruments[i + 1][1] if i + 1 < len(instruments) else None)
            for i in range(len(instruments))
        ]

        ibag = [struct.unpack_from("<HH", c["ibag"], off) for off in range(0, len(c["ibag"]), 4)]
        igen = [struct.unpack_from("<Hh", c["igen"], off) for off in range(0, len(c["igen"]), 4)]

        def zone_gens(bag, gen, zone_idx):
            g_start = bag[zone_idx][0]
            g_end = bag[zone_idx + 1][0] if zone_idx + 1 < len(bag) else len(gen)
            return dict(gen[g_start:g_end])

        # resolve instrument -> regions
        inst_regions: list[list[Region]] = []
        for i, (lo, hi) in enumerate(inst_bag_bounds):
            hi = hi if hi is not None else len(ibag) - 1
            regions = []
            global_gens: dict = {}
            for z in range(lo, hi):
                gens = zone_gens(ibag, igen, z)
                if GEN_SAMPLE_ID not in gens:
                    global_gens = gens  # instrument global zone
                    continue
                merged = dict(global_gens)
                merged.update(gens)
                sid = merged[GEN_SAMPLE_ID] & 0xFFFF
                if sid >= len(sample_headers):
                    continue
                regions.append(_region_from_gens(sample_headers[sid], merged))
            inst_regions.append(regions)

        # presets
        phdr = c["phdr"]
        pbag = [struct.unpack_from("<HH", c["pbag"], off) for off in range(0, len(c["pbag"]), 4)]
        pgen = [struct.unpack_from("<Hh", c["pgen"], off) for off in range(0, len(c["pgen"]), 4)]
        headers = []
        for off in range(0, len(phdr) - 38, 38):
            name = phdr[off : off + 20].split(b"\0")[0].decode("ascii", "replace")
            program, bank, bag_idx = struct.unpack_from("<HHH", phdr, off + 20)
            headers.append((name, program, bank, bag_idx))
        for i, (name, program, bank, bag_idx) in enumerate(headers):
            bag_end = headers[i + 1][3] if i + 1 < len(headers) else len(pbag) - 1
            preset = Preset(name, bank, program)
            for z in range(bag_idx, bag_end):
                gens = zone_gens(pbag, pgen, z)
                if GEN_INSTRUMENT not in gens:
                    continue  # preset global zone (ignored: minimal reader)
                inst_idx = gens[GEN_INSTRUMENT] & 0xFFFF
                if inst_idx >= len(inst_regions):
                    continue
                for r in inst_regions[inst_idx]:
                    rr = Region(**{**r.__dict__})
                    # preset-level key/vel range intersects
                    if GEN_KEY_RANGE in gens:
                        lo, hi = gens[GEN_KEY_RANGE] & 0xFF, (gens[GEN_KEY_RANGE] >> 8) & 0xFF
                        rr.key_lo, rr.key_hi = max(rr.key_lo, lo), min(rr.key_hi, hi)
                    regions_ok = rr.key_lo <= rr.key_hi
                    if regions_ok:
                        preset.regions.append(rr)
            self.presets[(bank, program)] = preset


def _region_from_gens(sample: SampleHeader, gens: dict) -> Region:
    r = Region(sample=sample, generators=dict(gens))
    if GEN_KEY_RANGE in gens:
        v = gens[GEN_KEY_RANGE]
        r.key_lo, r.key_hi = v & 0xFF, (v >> 8) & 0xFF
    if GEN_VEL_RANGE in gens:
        v = gens[GEN_VEL_RANGE]
        r.vel_lo, r.vel_hi = v & 0xFF, (v >> 8) & 0xFF
    if GEN_OVERRIDING_ROOT_KEY in gens and gens[GEN_OVERRIDING_ROOT_KEY] >= 0:
        r.root_key = gens[GEN_OVERRIDING_ROOT_KEY]
    if GEN_SAMPLE_MODES in gens:
        r.sample_modes = gens[GEN_SAMPLE_MODES] & 0x3
    if GEN_ATTACK_VOL_ENV in gens:
        r.attack_secs = _timecents_to_secs(gens[GEN_ATTACK_VOL_ENV])
    if GEN_RELEASE_VOL_ENV in gens:
        r.release_secs = _timecents_to_secs(gens[GEN_RELEASE_VOL_ENV])
    if GEN_INITIAL_ATTENUATION in gens:
        r.attenuation_cb = gens[GEN_INITIAL_ATTENUATION]
    if GEN_COARSE_TUNE in gens:
        r.coarse_tune = gens[GEN_COARSE_TUNE]
    if GEN_FINE_TUNE in gens:
        r.fine_tune = gens[GEN_FINE_TUNE]
    return r


def _parse_riff(data: bytes) -> tuple[np.ndarray, dict]:
    if data[:4] != b"RIFF" or data[8:12] != b"sfbk":
        raise ValueError("not an SF2 file")
    pos = 12
    samples = np.zeros(0, np.float32)
    chunks: dict[str, bytes] = {}
    end = 8 + struct.unpack_from("<I", data, 4)[0]
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"LIST":
            list_type = body[:4]
            sub = body[4:]
            spos = 0
            while spos + 8 <= len(sub):
                scid = sub[spos : spos + 4].decode("ascii", "replace").strip()
                (ssize,) = struct.unpack_from("<I", sub, spos + 4)
                sbody = sub[spos + 8 : spos + 8 + ssize]
                if list_type == b"sdta" and scid == "smpl":
                    samples = (
                        np.frombuffer(sbody[: len(sbody) // 2 * 2], "<i2").astype(np.float32)
                        / 32768.0
                    )
                elif list_type == b"pdta":
                    chunks[scid] = sbody
                spos += 8 + ssize + (ssize & 1)
        pos += 8 + size + (size & 1)
    required = {"phdr", "pbag", "pgen", "inst", "ibag", "igen", "shdr"}
    missing = required - set(chunks)
    if missing:
        raise ValueError(f"SF2 missing pdta chunks: {sorted(missing)}")
    return samples, chunks


def write_minimal_sf2(
    path: str,
    sample: np.ndarray,
    sample_rate: int,
    root_key: int = 60,
    loop: bool = True,
    name: str = "minisf",
) -> None:
    """Testing/tooling helper: writes a valid single-sample, single-preset
    SF2 file (preset 0/bank 0 covering the full key range)."""
    pcm = np.clip(np.asarray(sample) * 32767.0, -32768, 32767).astype("<i2").tobytes()
    pcm += b"\0" * 92  # 46 zero samples guard (spec requires >= 46)

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\0" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def name20(s: str) -> bytes:
        return s.encode("ascii")[:19].ljust(20, b"\0")

    n = len(sample)
    shdr = (
        name20(name)
        + struct.pack("<IIIII", 0, n, 0, n, sample_rate)
        + struct.pack("<Bb", root_key, 0)
        + struct.pack("<HH", 0, 1)  # link, type=mono
    )
    shdr += name20("EOS") + b"\0" * 26

    # instrument 0 with one zone: sampleModes + sampleID
    inst = name20(name) + struct.pack("<H", 0) + name20("EOI") + struct.pack("<H", 1)
    ibag = struct.pack("<HH", 0, 0) + struct.pack("<HH", 2, 0)
    igen = struct.pack("<Hh", GEN_SAMPLE_MODES, 1 if loop else 0) + struct.pack(
        "<Hh", GEN_SAMPLE_ID, 0
    )

    # preset 0:0 with one zone -> instrument 0
    phdr = (
        name20(name)
        + struct.pack("<HHH", 0, 0, 0)
        + struct.pack("<III", 0, 0, 0)
        + name20("EOP")
        + struct.pack("<HHH", 0, 0, 1)
        + struct.pack("<III", 0, 0, 0)
    )
    pbag = struct.pack("<HH", 0, 0) + struct.pack("<HH", 1, 0)
    pgen = struct.pack("<Hh", GEN_INSTRUMENT, 0)
    pmod = b""
    imod = b""

    pdta = b"pdta" + b"".join(
        chunk(cid, body)
        for cid, body in [
            (b"phdr", phdr),
            (b"pbag", pbag),
            (b"pmod", pmod + b"\0" * 10),
            (b"pgen", pgen + struct.pack("<Hh", 0, 0)),
            (b"inst", inst),
            (b"ibag", ibag),
            (b"imod", imod + b"\0" * 10),
            (b"igen", igen + struct.pack("<Hh", 0, 0)),
            (b"shdr", shdr),
        ]
    )
    info = b"INFO" + chunk(b"ifil", struct.pack("<HH", 2, 1)) + chunk(
        b"isng", b"EMU8000\0"
    ) + chunk(b"INAM", name.encode() + b"\0")
    sdta = b"sdta" + chunk(b"smpl", pcm)

    body = b"sfbk" + chunk(b"LIST", info) + chunk(b"LIST", sdta) + chunk(b"LIST", pdta)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)
