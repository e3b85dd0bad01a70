package graft.text

/** Deterministic CJK corpus fixture for the `q_tokenize_cjk*` oracle rows
  * — the WordPiece-fixture pattern applied to the dictionary segmenters.
  *
  * The driver testdata carries no CJK text (all five lang slices are
  * ASCII), so the gated `lindera:*` tokenize path — the reference's own
  * integration surface, `/root/reference/tests/test_lindera_integration
  * .py:34-111` — had no DuckDB-checkable input. This fixture closes that
  * gap: the corpus vocabulary is CLOSED (31 words at every SF), so each
  * word maps to a fixed ja/zh phrase and both engines can construct the
  * SAME synthetic CJK text — Spark via a map literal, DuckDB via a CASE —
  * while only Spark runs the real segmenter. The expected decomposition
  * of every phrase under the bundled dictionary DP (max-probability
  * route, ties to the longer word) is pinned here as data; DuckDB replays
  * it with running code-point offsets, which makes the oracle compare
  * STRICTLY stronger than the reference's invariants (offsets re-slice
  * the source; concatenated tokens reconstruct the non-space text): the
  * tokens and offsets must match exactly, not just re-assemble.
  *
  * Phrase design notes (each pins a distinct segmenter behavior):
  *   - multi-word DP routes (今日は良い天気 → 今日|は|良い|天気, the
  *     reference's 関西国際空港 → 関西|国際|空港 morpheme test),
  *   - particle split-off (会社の人 → 会社|の|人),
  *   - longest-word tie preference (解放军 whole, not 解放|军),
  *   - OOV single-code-point fallback (データ → デ|ー|タ, incl. the
  *     script=Common prolonged-sound mark U+30FC; 行/线 single Han chars),
  *   - mixed-script runs (API解析 → api|解析: the Latin run passes
  *     through intact and lowercased, only the CJK span segments —
  *     `tests/test_jieba_chinese.py:73-77` semantics).
  *
  * `CjkQueryFixtureSpec` asserts these decompositions against the REAL
  * backends (gate on), so a dictionary edit that shifts any DP route
  * fails the suite before it can surface as an oracle mismatch. */
object CjkQueryFixture {

  /** corpus word → synthetic Japanese phrase (segmented by
    * `lindera:ja-ipadic` via the bundled [[TokenizerModels.JaDict]]). */
  val jaPhrase: Map[String, String] = Map(
    "a" -> "の", "agg" -> "分析する", "batch" -> "部屋", "big" -> "大きい",
    "column" -> "言葉", "customer" -> "会社の人", "data" -> "データ",
    "dup" -> "それ", "fast" -> "簡単", "filter" -> "お茶", "group" -> "家族",
    "hash" -> "写真", "join" -> "友達と行く", "key" -> "名前", "line" -> "道",
    "merge" -> "山と川", "order" -> "時間", "part" -> "月", "query" -> "何",
    "row" -> "行", "scan" -> "見る", "slow" -> "古い", "small" -> "小さい",
    "sort" -> "朝", "spark" -> "API解析", "stream" -> "海",
    "table" -> "図書館", "the" -> "は", "value" -> "大切",
    "vector" -> "今日は良い天気", "window" -> "関西国際空港")

  /** Expected decomposition of each ja phrase: `(token, startCp, endCp)`
    * with offsets LOCAL to the phrase (the oracle adds the running word
    * start). Derived from the dictionary DP; spec-pinned. */
  val jaPieces: Map[String, Seq[(String, Int, Int)]] = Map(
    "a" -> Seq(("の", 0, 1)),
    "agg" -> Seq(("分析", 0, 2), ("する", 2, 4)),
    "batch" -> Seq(("部屋", 0, 2)),
    "big" -> Seq(("大きい", 0, 3)),
    "column" -> Seq(("言葉", 0, 2)),
    "customer" -> Seq(("会社", 0, 2), ("の", 2, 3), ("人", 3, 4)),
    "data" -> Seq(("デ", 0, 1), ("ー", 1, 2), ("タ", 2, 3)),
    "dup" -> Seq(("それ", 0, 2)),
    "fast" -> Seq(("簡単", 0, 2)),
    "filter" -> Seq(("お茶", 0, 2)),
    "group" -> Seq(("家族", 0, 2)),
    "hash" -> Seq(("写真", 0, 2)),
    "join" -> Seq(("友達", 0, 2), ("と", 2, 3), ("行く", 3, 5)),
    "key" -> Seq(("名前", 0, 2)),
    "line" -> Seq(("道", 0, 1)),
    "merge" -> Seq(("山", 0, 1), ("と", 1, 2), ("川", 2, 3)),
    "order" -> Seq(("時間", 0, 2)),
    "part" -> Seq(("月", 0, 1)),
    "query" -> Seq(("何", 0, 1)),
    "row" -> Seq(("行", 0, 1)),
    "scan" -> Seq(("見る", 0, 2)),
    "slow" -> Seq(("古い", 0, 2)),
    "small" -> Seq(("小さい", 0, 3)),
    "sort" -> Seq(("朝", 0, 1)),
    "spark" -> Seq(("api", 0, 3), ("解析", 3, 5)),
    "stream" -> Seq(("海", 0, 1)),
    "table" -> Seq(("図書館", 0, 3)),
    "the" -> Seq(("は", 0, 1)),
    "value" -> Seq(("大切", 0, 2)),
    "vector" -> Seq(("今日", 0, 2), ("は", 2, 3), ("良い", 3, 5), ("天気", 5, 7)),
    "window" -> Seq(("関西", 0, 2), ("国際", 2, 4), ("空港", 4, 6)))

  /** corpus word → synthetic Chinese phrase (segmented by
    * `lindera:jieba` via the bundled [[TokenizerModels.ZhDict]]). */
  val zhPhrase: Map[String, String] = Map(
    "a" -> "的", "agg" -> "数据分析", "batch" -> "系统", "big" -> "大",
    "column" -> "语言", "customer" -> "公司的人", "data" -> "数据",
    "dup" -> "问题", "fast" -> "很好", "filter" -> "电脑", "group" -> "大家",
    "hash" -> "信息", "join" -> "我们学习", "key" -> "模型", "line" -> "线",
    "merge" -> "中国人民", "order" -> "时间", "part" -> "平台",
    "query" -> "什么", "row" -> "一", "scan" -> "知道", "slow" -> "不",
    "small" -> "很", "sort" -> "现在", "spark" -> "API编程",
    "stream" -> "网络", "table" -> "解放军", "the" -> "是",
    "value" -> "老师", "vector" -> "今天天气很好", "window" -> "我们喜欢编程")

  val zhPieces: Map[String, Seq[(String, Int, Int)]] = Map(
    "a" -> Seq(("的", 0, 1)),
    "agg" -> Seq(("数据", 0, 2), ("分析", 2, 4)),
    "batch" -> Seq(("系统", 0, 2)),
    "big" -> Seq(("大", 0, 1)),
    "column" -> Seq(("语言", 0, 2)),
    "customer" -> Seq(("公司", 0, 2), ("的", 2, 3), ("人", 3, 4)),
    "data" -> Seq(("数据", 0, 2)),
    "dup" -> Seq(("问题", 0, 2)),
    "fast" -> Seq(("很好", 0, 2)),
    "filter" -> Seq(("电脑", 0, 2)),
    "group" -> Seq(("大家", 0, 2)),
    "hash" -> Seq(("信息", 0, 2)),
    "join" -> Seq(("我们", 0, 2), ("学习", 2, 4)),
    "key" -> Seq(("模型", 0, 2)),
    "line" -> Seq(("线", 0, 1)),
    "merge" -> Seq(("中国", 0, 2), ("人民", 2, 4)),
    "order" -> Seq(("时间", 0, 2)),
    "part" -> Seq(("平台", 0, 2)),
    "query" -> Seq(("什么", 0, 2)),
    "row" -> Seq(("一", 0, 1)),
    "scan" -> Seq(("知道", 0, 2)),
    "slow" -> Seq(("不", 0, 1)),
    "small" -> Seq(("很", 0, 1)),
    "sort" -> Seq(("现在", 0, 2)),
    "spark" -> Seq(("api", 0, 3), ("编程", 3, 5)),
    "stream" -> Seq(("网络", 0, 2)),
    "table" -> Seq(("解放军", 0, 3)),
    "the" -> Seq(("是", 0, 1)),
    "value" -> Seq(("老师", 0, 2)),
    "vector" -> Seq(("今天", 0, 2), ("天气", 2, 4), ("很好", 4, 6)),
    "window" -> Seq(("我们", 0, 2), ("喜欢", 2, 4), ("编程", 4, 6)))

  /** corpus word → synthetic Korean phrase (segmented by
    * `lindera:ko-dic` via the bundled [[TokenizerModels.KoDict]]).
    * Phrase design mirrors the ja/zh tiers: josa (particle) split-off
    * (회사의사람 → 회사|의|사람, the morpheme behavior the reference's ko
    * invariants exercise, `tests/test_lindera_integration.py:34-80`),
    * multi-word DP routes (한국어형태소분석 → 한국어|형태소|분석 — the
    * 한국|어 route loses to the listed 한국어), whole-word preference
    * over a listed prefix (형태소 whole, not 형태|소), OOV
    * syllable-level fallback (김치 → 김|치: neither syllable nor the
    * compound is in the dictionary), and a mixed-script run
    * (API분석 → api|분석: the Latin run passes through lowercased and
    * intact, only the Hangul span segments). */
  val koPhrase: Map[String, String] = Map(
    "a" -> "의", "agg" -> "분석하다", "batch" -> "학교", "big" -> "크다",
    "column" -> "단어", "customer" -> "회사의사람", "data" -> "김치",
    "dup" -> "그것", "fast" -> "빠르다", "filter" -> "물", "group" -> "가족",
    "hash" -> "사진", "join" -> "친구와가다", "key" -> "이름", "line" -> "길",
    "merge" -> "산과강", "order" -> "시간", "part" -> "월", "query" -> "무엇",
    "row" -> "일", "scan" -> "읽다", "slow" -> "느리다", "small" -> "작다",
    "sort" -> "아침", "spark" -> "API분석", "stream" -> "바다",
    "table" -> "형태소", "the" -> "은", "value" -> "사랑",
    "vector" -> "오늘은좋다", "window" -> "한국어형태소분석")

  val koPieces: Map[String, Seq[(String, Int, Int)]] = Map(
    "a" -> Seq(("의", 0, 1)),
    "agg" -> Seq(("분석", 0, 2), ("하다", 2, 4)),
    "batch" -> Seq(("학교", 0, 2)),
    "big" -> Seq(("크다", 0, 2)),
    "column" -> Seq(("단어", 0, 2)),
    "customer" -> Seq(("회사", 0, 2), ("의", 2, 3), ("사람", 3, 5)),
    "data" -> Seq(("김", 0, 1), ("치", 1, 2)),
    "dup" -> Seq(("그것", 0, 2)),
    "fast" -> Seq(("빠르다", 0, 3)),
    "filter" -> Seq(("물", 0, 1)),
    "group" -> Seq(("가족", 0, 2)),
    "hash" -> Seq(("사진", 0, 2)),
    "join" -> Seq(("친구", 0, 2), ("와", 2, 3), ("가다", 3, 5)),
    "key" -> Seq(("이름", 0, 2)),
    "line" -> Seq(("길", 0, 1)),
    "merge" -> Seq(("산", 0, 1), ("과", 1, 2), ("강", 2, 3)),
    "order" -> Seq(("시간", 0, 2)),
    "part" -> Seq(("월", 0, 1)),
    "query" -> Seq(("무엇", 0, 2)),
    "row" -> Seq(("일", 0, 1)),
    "scan" -> Seq(("읽다", 0, 2)),
    "slow" -> Seq(("느리다", 0, 3)),
    "small" -> Seq(("작다", 0, 2)),
    "sort" -> Seq(("아침", 0, 2)),
    "spark" -> Seq(("api", 0, 3), ("분석", 3, 5)),
    "stream" -> Seq(("바다", 0, 2)),
    "table" -> Seq(("형태소", 0, 3)),
    "the" -> Seq(("은", 0, 1)),
    "value" -> Seq(("사랑", 0, 2)),
    "vector" -> Seq(("오늘", 0, 2), ("은", 2, 3), ("좋다", 3, 5)),
    "window" -> Seq(("한국어", 0, 3), ("형태소", 3, 6), ("분석", 6, 8)))

  require(jaPhrase.keySet == jaPieces.keySet && zhPhrase.keySet == zhPieces.keySet &&
    koPhrase.keySet == koPieces.keySet &&
    koPhrase.keySet == jaPhrase.keySet,
    "CjkQueryFixture: phrase/pieces key sets must match")
}
