package graft

import graft.ops.HashKey._

/** Golden vectors generated from CPython json.dumps(sort_keys=True,
  * ensure_ascii=True, separators=(', ', ': ')) + hashlib.sha1 —
  * the exact call the reference makes (queue/request_tools.py:37-45). */
object CanonicalJsonVectors {
  // (name, value, expected json, expected sha1)
  val cases: Seq[(String, JVal, String, String)] = Seq(
    ("simple_obj", JObj(Seq("b" -> JInt(1L), "a" -> JStr("x"))), "{\"a\": \"x\", \"b\": 1}", "d2d874a6b732a58cf909d2ee0627324f7f5cfce9"),
    ("nested", JObj(Seq("dataset" -> JStr("nigeriaaims_geocodedresearchrelease_level1_v1_3"), "type" -> JStr("release"), "resolution" -> JFloat(0.05), "version" -> JStr("0.1"), "filters" -> JObj(Seq("donors" -> JArr(Seq(JStr("AFDB"))))))), "{\"dataset\": \"nigeriaaims_geocodedresearchrelease_level1_v1_3\", \"filters\": {\"donors\": [\"AFDB\"]}, \"resolution\": 0.05, \"type\": \"release\", \"version\": \"0.1\"}", "1e7b27768cb5caeb17d80b25dacd89bf84fc2f10"),
    ("unicode", JObj(Seq("name" -> JStr("caf\u00e9 \u4e2d\u6587"), "tab" -> JStr("a\tb\nc"))), "{\"name\": \"caf\\u00e9 \\u4e2d\\u6587\", \"tab\": \"a\\tb\\nc\"}", "1027649a0182ab3f7f49ea64637fd5ef7baa29a1"),
    ("floats", JObj(Seq("a" -> JFloat(0.05), "b" -> JFloat(123.0), "c" -> JFloat(10000000.0), "d" -> JFloat(1e+16), "e" -> JFloat(5e-05), "f" -> JFloat(-0.0), "g" -> JFloat(1.5e-07), "h" -> JFloat(3.14159), "i" -> JFloat(1234.56))), "{\"a\": 0.05, \"b\": 123.0, \"c\": 10000000.0, \"d\": 1e+16, \"e\": 5e-05, \"f\": -0.0, \"g\": 1.5e-07, \"h\": 3.14159, \"i\": 1234.56}", "ab1e76549fa5fd027ea084712873a9cc42cab0e3"),
    ("ints", JObj(Seq("neg" -> JInt(-42L), "zero" -> JInt(0L), "big" -> JInt(9007199254740993L))), "{\"big\": 9007199254740993, \"neg\": -42, \"zero\": 0}", "d27e4162ae0f7fc5f77b53954a24451656d50d56"),
    ("bools_null", JObj(Seq("t" -> JBool(true), "f" -> JBool(false), "n" -> JNull)), "{\"f\": false, \"n\": null, \"t\": true}", "9f5ba03e9ae1472369aa1d2a94f98ff63ba7f448"),
    ("arrays", JObj(Seq("xs" -> JArr(Seq(JInt(1L), JFloat(2.5), JStr("three"), JNull, JBool(true))), "empty" -> JArr(Seq()), "eobj" -> JObj(Seq()))), "{\"empty\": [], \"eobj\": {}, \"xs\": [1, 2.5, \"three\", null, true]}", "9ad698ab45ba13bd2cd19c070fcb7b9b602647d3"),
    ("quotes", JObj(Seq("q" -> JStr("he said \"hi\" \\ end"))), "{\"q\": \"he said \\\"hi\\\" \\\\ end\"}", "1e3675a840bf170c813b5446a6dc0ebb314e260a"),
  )
}
