"""Feature-block pins with default offsets (Schema.hs:309-322; FIXTURES F7)."""

from nerfray.core import schema


def test_split_orth():
    conf = schema.SchemaConf(split_orth=[-1, 0])
    obs = schema.schematize(conf, ["Ala", "ma"])
    # token 0: lowercased self + original (has upper); no k-1 neighbour
    assert obs[0] == {"1.0@0=ala", "1.1@0=Ala"}
    # token 1: self (all lower, no .1) + neighbour at -1
    assert obs[1] == {"1.0@0=ma", "1.0@-1=ala", "1.1@-1=Ala"}


def test_low_suffixes_default():
    conf = schema.SchemaConf(low_suffixes=([2, 3, 4], [0]))
    obs = schema.schematize(conf, ["Warsaw"])
    assert obs[0] == {"3.0@0=aw", "3.1@0=saw", "3.2@0=rsaw"}
    # short token: lengths beyond len produce no observation
    assert schema.schematize(conf, ["ab"])[0] == {"3.0@0=ab"}


def test_lemma_block_trims():
    conf = schema.SchemaConf(lemma=(2, [0]))
    obs = schema.schematize(conf, ["Abcd"])
    assert obs[0] == {
        "4.p0@0=abcd", "4.s0@0=abcd",   # trim 0
        "4.p1@0=abc", "4.s1@0=bcd",     # trim 1
        "4.p2@0=ab", "4.s2@0=cd",       # trim 2
    }


def test_shape_and_packed():
    conf = schema.SchemaConf(shape=[0], packed=[0])
    obs = schema.schematize(conf, ["Ab-12"])
    assert "5.0@0=ulxdd" in obs[0]
    assert "6.0@0=ulxd" in obs[0]


def test_pair_blocks():
    conf = schema.SchemaConf(shape_pair=[0], packed_pair=[0])
    obs = schema.schematize(conf, ["Ab", "cd12"])
    assert obs[0] == set()  # no k-1 neighbour
    assert "7.0@0=ul-lldd" in obs[1]
    assert "8.0@0=ul-ld" in obs[1]


def test_dict_block_multi_label_and_offsets():
    table = {"os": ("library", "module")}
    conf = schema.SchemaConf(dicts=[("lib", table, [-1, 0])])
    obs = schema.schematize(conf, ["import", "os"])
    assert obs[1] == {"9.lib@0=library", "9.lib@0=module"}
    # next-token view at offset -1 lands on the token AFTER the dict hit
    assert obs[0] == set()
    obs2 = schema.schematize(conf, ["os", "x"])
    assert obs2[1] == {"9.lib@-1=library", "9.lib@-1=module"}


def test_block_order_is_identity():
    """Observation keys embed block index + offset: two confs with the same
    block at the same offset produce identical keys (vocab stability)."""
    c1 = schema.SchemaConf(shape=[0])
    c2 = schema.SchemaConf(shape=[0])
    assert schema.schematize(c1, ["Xy"]) == schema.schematize(c2, ["Xy"])


def test_conf_json_roundtrip():
    conf = schema.default_conf(
        ne_dicts=[("d", {"os": ("library",)})],
        int_dict={"import": ("trig",)}, ext_dict={"the": ("trig",)})
    conf2 = schema.SchemaConf.from_config(conf.to_config())
    ws = ["import", "os", "the", "Apache"]
    assert schema.schematize(conf, ws) == schema.schematize(conf2, ws)


def test_custom_block_registry():
    """§2.10 extension surface: a user-registered block participates in
    extraction, survives config round-trip, and a model trained with it
    tags correctly."""
    import pytest
    from nerfray.core import crf

    def digit_flags(words, j):
        w = words[j]
        return [("hasdig", "y" if any(c.isdigit() for c in w) else "n")]

    schema.register_block("digit_flags", digit_flags)
    conf = schema.SchemaConf(orth=[0], custom=[("digit_flags", [0])])
    obs = schema.schematize(conf, ["abc", "a1"])
    assert any("digit_flags.hasdig@0=n" in o for o in obs[0])
    assert any("digit_flags.hasdig@0=y" in o for o in obs[1])

    # config round-trip references the block by name
    conf2 = schema.SchemaConf.from_config(conf.to_config())
    assert schema.schematize(conf2, ["abc", "a1"]) == obs

    # unregistered name fails loudly
    bad = schema.SchemaConf(custom=[("nope", [0])])
    with pytest.raises(KeyError):
        schema.schematize(bad, ["x"])

    # end-to-end: a model whose only generalizing signal is the custom
    # block must separate digit tokens from letter tokens
    sents, labels = [], []
    for ws, ys in [(["abc", "12"], ["O", "B:num"]),
                   (["7", "zz"], ["B:num", "O"]),
                   (["x9", "qq"], ["B:num", "O"])]:
        sents.append(schema.schematize(conf, ws))
        labels.append(ys)
    m = crf.train(sents, labels, crf.SgdArgs(iter_num=8))
    got = m.viterbi(schema.schematize(conf, ["hello", "42"]))
    assert got == ["O", "B:num"]
