#!/usr/bin/env python3
"""Golden-output generator: executes the REFERENCE's own transform code
(/root/reference/aprs2influxdb/__main__.py, read-only) on a fixture battery
and records (packet, expected line-protocol string) pairs.

Py3 shims (the reference is Py2): StandardError -> Exception, and
encode('ascii','replace') gains .decode('ascii') so parseTextString sees a
str like it did on Py2. Computed-float fixtures use binary-exact
coefficients so py2/py3 float repr agree (the Scala engine implements py2
str(float) = 12-significant-digit shortest form in general).

Outputs (committed as test resources):
  src/test/resources/aprs_fixtures.jsonl  one packet per line, field "_idx"
  src/test/resources/aprs_golden.txt      per index: expected line or \\N
"""
import json, sys, types, logging

SRC = "/root/reference/aprs2influxdb/__main__.py"

def load_reference():
    src = open(SRC).read()
    src = src.replace("except StandardError", "except Exception")
    src = src.replace(".encode('ascii', 'replace')",
                      ".encode('ascii', 'replace').decode('ascii')")
    # stub the external modules the transform core never actually uses
    for name in ("aprslib", "influxdb"):
        m = types.ModuleType(name)
        m.InfluxDBClient = object
        m.IS = object
        m.passcode = lambda c: 0
        sys.modules.setdefault(name, m)
    sys.argv = ["aprs2influxdb"]
    mod = types.ModuleType("ref_main")
    mod.__dict__["__name__"] = "ref_main"
    exec(compile(src, SRC, "exec"), mod.__dict__)
    mod.logger = logging.getLogger("ref")
    mod.telemetryDictionary = {}
    return mod

# ---------------------------------------------------------------- fixtures
# Sequence order matters: telemetry-message packets mutate calibration state.
FIXTURES = [
    # --- uncompressed: full, minimal, optional subsets
    {"format": "uncompressed", "from": "KB1LQC-1", "to": "APRS", "via": "WIDE2-2",
     "path": ["WIDE1-1", "WIDE2-2"], "latitude": 42.44, "longitude": -76.51,
     "posambiguity": 0, "altitude": 250.0, "speed": 10.5, "course": 90,
     "messagecapable": True, "comment": "test comment", "symbol": "-",
     "symbol_table": "/", "raw_timestamp": "092345z"},
    {"format": "uncompressed", "from": "N0CALL", "latitude": 1.5, "longitude": -2.25},
    {"format": "uncompressed", "from": "K1A", "to": "APRS", "phg": "5132",
     "rng": "0020", "path": [], "comment": ""},
    {"format": "uncompressed", "from": "K1B", "raw": "K1B>APRS:!4244.00N/07631.00W-",
     "messagecapable": False},
    # --- escaping edge cases (uncompressed comment path)
    {"format": "uncompressed", "from": "K1C", "comment": "café"},
    {"format": "uncompressed", "from": "K1D", "comment": "a\\b\"c'd"},
    {"format": "uncompressed", "from": "K1E", "comment": "tab\there"},
    {"format": "uncompressed", "from": "K1F", "via": "W1\"X"},
    {"format": "uncompressed", "from": "K1G", "symbol": "\\", "symbol_table": "\\"},
    # --- mic-e
    {"format": "mic-e", "from": "N0CALL-9", "to": "T2TT4R", "via": "WIDE1-1",
     "path": ["WIDE1-1"], "latitude": 33.427, "longitude": -111.94,
     "posambiguity": 0, "mbits": 110, "mtype": "M0: Off Duty",
     "comment": "/mic-e unit"},
    {"format": "mic-e", "from": "N1CALL-9", "latitude": 10.5, "longitude": 20.25,
     "altitude": 100.0, "speed": 0.0, "course": 359, "daodatumbyte": "W",
     "symbol": ">", "symbol_table": "/", "raw": "raw`packet"},
    # --- object (alive bool, telemetry-before-raw tail)
    {"format": "object", "from": "K1XYZ", "to": "APRS", "alive": True,
     "object_name": "REPEATER", "object_format": "uncompressed",
     "timestamp": 1509600000, "latitude": 40.0, "longitude": -75.0,
     "posambiguity": 0, "comment": "147.09 MHz"},
    {"format": "object", "from": "K2XYZ", "alive": False, "object_name": "NET ",
     "rng": "0050", "daodatumbyte": "!", "speed": 25.5, "course": 180},
    # --- status (telemetry with NO prior tEQNS -> identity scaling)
    {"format": "status", "from": "KB1LQD", "to": "APRS", "path": ["TCPIP*"],
     "status": "aprs2influxdb heartbeat 1509600000",
     "telemetry": {"seq": 42, "bits": "00000000", "vals": [120, 85, 0, 10, 3]}},
    {"format": "status", "from": "KB1LQE", "timestamp": 1509600123,
     "status": "hello", "raw_timestamp": "092345z"},
    # --- telemetry-message: sets calibration for KB1LQD (emits nothing)
    {"format": "telemetry-message", "from": "KB1LQD", "addresse": "KB1LQD",
     "tEQNS": [[0, 5.25, 3], [0.5, 2.0, 0], [0, 0.25, 0], [0, 1, 0], [0, 1, 0]]},
    # --- status again: KB1LQD now scaled by the eqns above
    {"format": "status", "from": "KB1LQD", "to": "APRS",
     "telemetry": {"seq": 43, "bits": "10101010", "vals": [100, 10, 8, 2, 1]}},
    # --- recalibration: overwrite, then use
    {"format": "telemetry-message", "from": "KB1LQD", "addresse": "KB1LQD",
     "tEQNS": [[0, 2.0, 1], [0, 1, 0], [0, 1, 0], [0, 1, 0], [0, 1, 0]]},
    {"format": "status", "from": "KB1LQD",
     "telemetry": {"seq": 44, "bits": "11110000", "vals": [4, 5, 6, 7, 8]}},
    # --- other station unaffected (identity)
    {"format": "status", "from": "KC0OTH",
     "telemetry": {"seq": 1, "bits": "0", "vals": [9, 8, 7, 6, 5]}},
    # --- compressed (gpsfixstatus; weather subset; tail order)
    {"format": "compressed", "from": "W1AW", "to": "APRS", "gpsfixstatus": 1,
     "latitude": 41.714, "longitude": -72.727, "altitude": 52.0,
     "messagecapable": False, "weather": {"temperature": 21.5, "humidity": 64.0}},
    {"format": "compressed", "from": "W2AW", "latitude": 1.0, "longitude": 2.0,
     "speed": 33.25, "course": 45, "timestamp": 1509600456, "phg": "7250",
     "via": "TCPIP*", "path": ["TCPIP*", "qAC"], "comment": "cmp",
     "telemetry": {"seq": 7, "bits": "01", "vals": [1, 2, 3, 4, 5]},
     "raw": "w2aw>raw", "symbol": "_", "symbol_table": "/"},
    # --- wx (all 9 weather keys -> fixed emission order)
    {"format": "wx", "from": "CW0003", "to": "APRS", "wx_raw_timestamp": "10090233",
     "weather": {"humidity": 87.0, "pressure": 1013.25, "rain_1h": 0.0,
                 "rain_24h": 2.5, "rain_since_midnight": 1.25,
                 "temperature": 12.75, "wind_direction": 225.0,
                 "wind_gust": 8.0, "wind_speed": 3.5}},
    {"format": "wx", "from": "CW0004", "comment": "wx station",
     "weather": {"temperature": -5.5}},
    # --- beacon
    {"format": "beacon", "from": "DIGI-1", "to": "BEACON", "path": ["WIDE2-1"],
     "text": "Mt Beacon digi, solar powered"},
    {"format": "beacon", "from": "DIGI-2", "raw": "DIGI-2>BEACON:>test"},
    # --- bulletin (bid numeric)
    {"format": "bulletin", "from": "K9ABC", "to": "BLN3", "bid": 3,
     "message_text": "Net tonight 8pm 146.52"},
    {"format": "bulletin", "from": "K9DEF", "bid": 12, "identifier": "WX",
     "message_text": "storm warning", "raw": "K9DEF>APRS::BLN12WX :storm"},
    # --- message (msgNo numeric, addresse spelling)
    {"format": "message", "from": "KB1LQC", "to": "APRS", "addresse": "KB1LQD",
     "msgNo": 7, "message_text": "QSL 73"},
    {"format": "message", "from": "KB1LQF", "addresse": "KB1LQG",
     "response": "ack", "message_text": "ack7"},
    # --- tail-order coverage: object w/ telemetry BEFORE raw; wx w/ raw;
    #     status w/ raw
    {"format": "object", "from": "K3XYZ", "alive": True, "object_name": "T1",
     "telemetry": {"seq": 5, "bits": "11", "vals": [1, 2, 3, 4, 5]},
     "raw": "K3XYZ>APRS:;T1", "symbol": "#", "symbol_table": "/",
     "raw_timestamp": "111111z", "comment": "obj telemetry"},
    {"format": "wx", "from": "CW0005", "comment": "c", "raw": "CW0005>wx",
     "wx_raw_timestamp": "10090233", "weather": {"wind_speed": 1.5}},
    {"format": "status", "from": "K4ST", "status": "s", "raw": "K4ST>APRS:>s",
     "raw_timestamp": "222222z"},
    # --- drops: unknown formats
    {"format": "telemetry", "from": "K1T",
     "telemetry": {"seq": 9, "bits": "1", "vals": [1, 2, 3, 4, 5]}},
    {"format": "weather", "from": "K1W"},
    # --- error-drop: short vals list raises inside parseTelemetry
    {"format": "status", "from": "K1ERR",
     "telemetry": {"seq": 2, "bits": "0", "vals": [1, 2]}},
]

def main():
    mod = load_reference()
    fixtures_out = open("src/test/resources/aprs_fixtures.jsonl", "w")
    golden_out = open("src/test/resources/aprs_golden.txt", "w")
    n_lines = 0
    for i, fx in enumerate(FIXTURES):
        line = mod.jsonToLineProtocol(dict(fx))
        rec = dict(fx)
        rec["_idx"] = i
        fixtures_out.write(json.dumps(rec) + "\n")
        golden_out.write((line if line is not None else "\\N") + "\n")
        if line is not None:
            n_lines += 1
    fixtures_out.close(); golden_out.close()
    print(f"{len(FIXTURES)} fixtures, {n_lines} non-null lines")
    print("final calibration state:", mod.telemetryDictionary)

if __name__ == "__main__":
    main()
