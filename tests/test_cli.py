"""CLI surface tests (reference bin/gpml2pvjson parity)."""

from __future__ import annotations

import json
import subprocess
import sys

GPML = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<Pathway xmlns="http://pathvisio.org/GPML/2013a" Name="t1" Version="1">\n'
    '<Graphics BoardWidth="100.0" BoardHeight="100.0" />\n'
    '<DataNode TextLabel="X" GraphId="ab123" Type="Protein">\n'
    '<Graphics CenterX="50.0" CenterY="50.0" Width="80.0" Height="20.0" '
    'ZOrder="32768" FontSize="10" Valign="Middle" />\n'
    '<Xref Database="Entrez Gene" ID="77" />\n'
    '</DataNode>\n'
    '</Pathway>'
)


def _run(args, stdin_text):
    return subprocess.run([sys.executable, "-m", "gpml2pvjson_js_ray"] + args,
                          input=stdin_text, capture_output=True, text=True,
                          cwd="/root/repo")


def test_convert_multi_document_stream():
    out = _run(["convert"], GPML + "\n" + GPML.replace("t1", "t2"))
    assert out.returncode == 0, out.stderr
    docs = [json.loads(line) for line in out.stdout.splitlines()]
    assert len(docs) == 2
    assert {d["pathway"]["name"] for d in docs} == {"t1", "t2"}
    # sha256 fallback ids differ because the input bytes differ
    assert docs[0]["pathway"]["id"] != docs[1]["pathway"]["id"]
    assert all(d["pathway"]["id"].startswith("hash://sha256/") for d in docs)
    assert docs[0]["entitiesById"]["ab123"]["xrefIdentifier"] == "77"


def test_convert_id_and_version_flags():
    out = _run(["convert", "--id", "http://x/WP1", "--pathway-version", "9"],
               GPML)
    doc = json.loads(out.stdout.splitlines()[0])
    assert doc["pathway"]["id"] == "http://x/WP1"
    assert doc["pathway"]["pathwayVersion"] == "9"
    assert doc["pathway"]["@context"][1] == {"@base": "http://x/WP1/"}


def test_convert_header_variants():
    """lowercase-utf-8 / single-quotes / headerless fixtures
    (bin/gpml2pvjson:60-61 case-insensitive header regex)."""
    lower = GPML.replace('<?xml version="1.0" encoding="UTF-8"?>',
                         '<?xml version="1.0" encoding="utf-8"?>')
    single = GPML.replace('<?xml version="1.0" encoding="UTF-8"?>',
                          "<?xml version='1.0' encoding='UTF-8'?>")
    out = _run(["convert"], lower + "\n" + single)
    assert out.returncode == 0, out.stderr
    docs = [json.loads(line) for line in out.stdout.splitlines()]
    assert len(docs) == 2
    assert all(d["entitiesById"]["ab123"]["textContent"] == "X"
               for d in docs)


def test_convert_malformed_exits_nonzero():
    out = _run(["convert"], GPML[:150] + "</Pathway>")
    assert out.returncode == 1
    assert "GPML parse failed" in out.stderr


def test_convert_chunked_stdin_equals_batch():
    """Chunked/throttled stdin feed (the reference's chunked-stream test,
    package.json test:chunkedStream) must produce byte-identical output to
    a single-write feed — the CLI streams the splitter over stdin chunks,
    it does not slurp."""
    stream = GPML + "\r\n" + GPML.replace("t1", "t2") + "\n"
    whole = _run(["convert"], stream)
    assert whole.returncode == 0, whole.stderr
    # same text fed through a pipe in tiny chunks with delays
    import subprocess
    import time
    proc = subprocess.Popen(
        [sys.executable, "-m", "gpml2pvjson_js_ray", "convert"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, cwd="/root/repo")
    step = 37  # prime-sized chunks so every delimiter spans a boundary
    for i in range(0, len(stream), step):
        proc.stdin.write(stream[i:i + step])
        proc.stdin.flush()
        if i % (step * 8) == 0:
            time.sleep(0.005)
    stdout, stderr = proc.communicate()
    assert proc.returncode == 0, stderr
    assert stdout == whole.stdout
    assert len(stdout.splitlines()) == 2


def test_incremental_splitter_matches_batch():
    """Property: iter_split_gpml_stream over arbitrary chunkings equals
    split_concatenated_gpml over the whole text."""
    from gpml2pvjson_js_ray.functions.islands import (
        iter_split_gpml_stream, split_concatenated_gpml)
    g2 = GPML.replace("t1", "t2")
    cases = [
        GPML + "\n" + g2,
        "junk before header " + GPML + "\r\n\r\n" + g2,
        GPML.split("?>", 1)[1] + "\n" + GPML,   # headerless first doc
        g2.split("?>", 1)[1],                    # fully headerless stream
        GPML + "\n<Pathway trailing fragment",
    ]
    for text in cases:
        batch = split_concatenated_gpml(text)
        for size in (1, 7, 64, 100000):
            chunks = [text[i:i + size] for i in range(0, len(text), size)]
            assert list(iter_split_gpml_stream(chunks)) == batch, \
                (size, text[:60])
