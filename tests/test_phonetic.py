"""Published-vector pins for the phonetic encoders (no Ray)."""


def test_soundex_published_vectors():
    from osm_cut_ray.functions.phonetic import soundex

    # U.S. National Archives / Knuth TAOCP vol. 3 examples
    vectors = {
        "Robert": "R163", "Rupert": "R163",
        "Ashcraft": "A261", "Ashcroft": "A261",   # H/W transparent
        "Tymczak": "T522",
        "Pfister": "P236",
        "Honeyman": "H555",
        "Washington": "W252",
        "Lee": "L000",
        "Gutierrez": "G362",
        "Jackson": "J250",
        "VanDeusen": "V532",
    }
    for name, code in vectors.items():
        assert soundex(name) == code, (name, soundex(name))


def test_soundex_edge_cases():
    from osm_cut_ray.functions.phonetic import soundex

    assert soundex("") == ""
    assert soundex("123") == ""
    assert soundex("A") == "A000"
    assert soundex("o'Brien") == soundex("OBrien")
    assert soundex("smith") == soundex("SMITH") == "S530"
    assert soundex("Smith") == soundex("Smyth")


def test_nysiis_published_vectors():
    from osm_cut_ray.functions.phonetic import nysiis

    # canonical examples from the published NYSIIS description
    vectors = {
        "MACINTOSH": "MCANT",
        "KNUTH": "NNAT",
        "PHILLIPS": "FFALAP",
        "BROWN": "BRAN",
    }
    for name, code in vectors.items():
        assert nysiis(name) == code, (name, nysiis(name))
    # same-sounding surnames collide (note: published NYSIIS keeps
    # Y distinct from the A-mapped vowels, so Smith != Smyth there)
    assert nysiis("Brown") == nysiis("Braun")
    assert nysiis("") == ""


def test_phonetic_arrays():
    import numpy as np

    from osm_cut_ray.functions.phonetic import (nysiis_array,
                                                soundex_array)

    out = soundex_array(["Robert", "Lee"])
    assert out.tolist() == ["R163", "L000"]
    out2 = nysiis_array(np.array(["Brown"]))
    assert out2[0] == "BRAN"
