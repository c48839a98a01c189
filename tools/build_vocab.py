"""Generate the bundled fallback WordPiece vocab
(empirical_mvm_tpu/assets/fallback-uncased-vocab.txt).

The reference downloads ``bert-base-uncased`` from the HF hub at startup
(ref: dataset.py:22); in a zero-egress deployment that dies. This generator
produces a deterministic, self-contained vocab with the SAME structural
layout as bert-base-uncased — 30,522 entries, [PAD]=0, [UNK]=100, [CLS]=101,
[SEP]=102, [MASK]=103, [unusedN] filler elsewhere in the low range — so
every special-token id and the vocab size match the real thing and any
config/head built against bert-base-uncased geometry works unchanged.

Coverage: all printable ASCII as standalone AND ``##`` continuation pieces
(so NO ascii word ever maps to [UNK] — greedy longest-match falls back to
character pieces), a few thousand common English words, and the most common
WordPiece suffixes. Word-level ids will NOT match the real
bert-base-uncased vocab: to run a released checkpoint at full text parity,
drop the official ``vocab.txt`` next to it and point ``DataConfig.tokenizer``
at that file. For pretraining from scratch, this vocab is complete.
"""

import os
import string
import sys

VOCAB_SIZE = 30522

# ~1.5k common English words (uncased). Order defines ids — append only.
COMMON_WORDS = """
the of and a to in is was he for it with as his on be at by i this had not
are but from or have an they which one you were her all she there would
their we him been has when who will more no if out so said what up its
about into than them can only other new some could time these two may then
do first any my now such like our over man me even most made after also did
many before must through back years where much your way well down should
because each just those people mr how too little state good very make world
still own see men work long get here between both life being under never
day same another know while last might us great old year off come since
against go came right used take three states himself few house use during
without again place american around however home small found mrs thought
went say part once general high upon school every don does got united left
number course war until always away something fact though water less public
put think almost hand enough far took head yet government system better set
told nothing night end why called didn eyes find going look asked later
knew point next program city business give group toward young days let room
within children side social given present several order national second
possible rather per face among form important often things looked early
white case become large need big four felt along god saw best church ever
least power development light thing family interest want members mind
country area others although turned done open service certain kind began
different door thus help means sense whole matter perhaps itself times
human line above name example action company hands local show whether five
history gave today either act feet across taken anything seen quite
having death week field car word already themselves information tell
together shall college money period held keep sure real probably free seems
behind cannot political air question office brought whose special major
heard problem ago became available federal moment study known result street
economic boy position reason change south board individual job society
areas west close turn love community true court force full seem wanted
ground party due fire am age everything usually involved alone hour
students move provide feel nature record live book play others plan
music percent room cost million body business run short stood town
earth class clear followed strong leave six effect student army cut
read level girl instead common future black maybe hours mother total
wife outside report person trying leaders member law cases certainly
increase woman congress particular food nor control working radio poor
received single worked seven election support various sound view dark
lost started making space needed words months modern process return
picture paper similar final training value research international
university center sort coming third longer game least difficult anyone
easy deal influence basis nearly indeed past stage mean committee
defense equipment written especially basic son kept ten ready trade
hard simple square tax land statement red private story department
purpose complete experience else direct method idea population low
account lines fine hope project pay pressser meeting market hotel
image situation results except role cause top technology data half
film entire costs industry figure piece plant stock bill late cold
hall bring rest sent vote industrial expected plane target type
america president washington england london york china japan europe
france germany india russia video image images frame frames model
models text language vision visual question answer questions answers
caption captions object objects scene scenes action actions person
people camera motion temporal spatial mask masked token tokens
feature features learning deep neural network networks training test
validation dataset datasets machine computer science research
zero one two three four five six seven eight nine ten eleven twelve
twenty thirty forty fifty hundred thousand million billion
january february march april may june july august september october
november december monday tuesday wednesday thursday friday saturday
sunday morning evening afternoon
dog cat bird fish horse cow sheep lion tiger bear elephant monkey
ball table chair bed window wall floor roof tree flower grass sky
cloud rain snow sun moon star river lake sea ocean mountain road
walk walks walking walked run runs running ran jump jumps jumping
jumped sit sits sitting sat stand stands standing talk talks talking
talked eat eats eating ate drink drinks drinking drank play plays
playing played watch watches watching watched hold holds holding
wear wears wearing wore ride rides riding rode throw throws throwing
catch catches catching cook cooks cooking dance dances dancing sing
sings singing swim swims swimming drive drives driving climb climbs
climbing open opens opening opened close closes closing closed
man woman boy girl child baby kid guy lady men women kids babies
red orange yellow green blue purple pink brown gray grey
shirt pants dress hat shoes jacket coat glasses
kitchen bathroom bedroom living garden park beach street city village
car bus train plane bike bicycle boat ship truck motorcycle
phone computer laptop screen keyboard camera television remote
apple banana orange bread cake pizza rice meat chicken egg milk
coffee tea juice wine beer bottle glass cup plate bowl knife fork
spoon happy sad angry surprised scared excited tired hungry thirsty
big small tall short long wide narrow thick thin heavy fast slow
hot cold warm cool wet dry clean dirty new old young beautiful ugly
""".split()

SUFFIX_PIECES = """
##s ##ed ##ing ##er ##ers ##est ##ly ##tion ##tions ##al ##ally ##ive
##able ##ible ##ness ##ment ##ments ##ful ##less ##ist ##ists ##ism
##ize ##ized ##izing ##ous ##ious ##ic ##ical ##ity ##ities ##ate
##ated ##ating ##ation ##en ##ens ##ened ##ia ##ian ##ians ##man ##men
##land ##ville ##ton ##son ##field ##wood ##berg ##ster ##ery ##ary
##ory ##age ##ages ##ance ##ence ##ant ##ent ##ents ##ure ##ures
##ish ##ness ##ship ##hood ##dom ##th ##ths ##ward ##wards ##wise
##like ##time ##line ##lines ##work ##works ##side ##sides ##ra ##ro
##le ##les ##ley ##ney ##ry ##ty ##cy ##sy ##my ##py ##by ##dy ##fy
##gy ##hy ##ky ##ny ##vy ##wy ##xy ##zy ##ch ##ck ##ff ##gh ##ll ##mm
##nn ##pp ##rr ##ss ##tt ##zz ##nd ##nt ##ng ##nk ##mp ##mb ##rd ##rt
##rk ##rm ##rn ##lp ##lt ##ld ##lk ##lf ##st ##sk ##sp ##ct ##pt ##xt
##an ##in ##on ##un ##ar ##or ##ur ##ir ##as ##es ##is ##os ##us ##at
##et ##it ##ot ##ut ##am ##em ##im ##om ##um ##ad ##ode ##ide ##ade
##one ##ane ##ine ##ape ##ope ##ipe ##ake ##ike ##oke ##ale ##ile
##ole ##ule ##ame ##ime ##ome ##ace ##ice ##ore ##are ##ere ##ire
##ue ##ee ##oo ##ea ##ou ##ai ##ei ##ie ##oa ##au ##aw ##ay ##ey
##oy ##ow ##ew
""".split()


def build() -> list[str]:
    toks: list[str] = []
    unused = iter(range(100000))

    def pad_unused(upto: int) -> None:
        while len(toks) < upto:
            toks.append(f"[unused{next(unused)}]")

    toks.append("[PAD]")
    pad_unused(100)
    toks += ["[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    pad_unused(999)

    seen = set(toks)

    def add(t: str) -> None:
        if t and t not in seen:
            seen.add(t)
            toks.append(t)

    # punctuation + digits + letters, standalone and as continuations —
    # guarantees char-level fallback for every printable-ascii word
    for ch in string.punctuation:
        add(ch)
    for ch in string.digits + string.ascii_lowercase:
        add(ch)
    for ch in string.digits + string.ascii_lowercase:
        add("##" + ch)
    for w in COMMON_WORDS:
        add(w.lower())
    for p in SUFFIX_PIECES:
        add(p.lower())
    for year in range(1800, 2100):          # years are common in captions
        add(str(year))
    for n in list(range(0, 101)) + [200, 500, 1000]:
        add(str(n))

    assert len(toks) <= VOCAB_SIZE, len(toks)
    pad_unused(VOCAB_SIZE)
    return toks


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "empirical_mvm_tpu", "assets", "fallback-uncased-vocab.txt")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    toks = build()
    with open(out, "w") as f:
        f.write("\n".join(toks) + "\n")
    print(f"wrote {len(toks)} tokens to {out}")
    sys.exit(0)


if __name__ == "__main__":
    main()
