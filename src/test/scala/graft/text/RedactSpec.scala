package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def run(s: String): String =
    Seq(s).toDF("t").select(Redact.redact(col("t"))).as[String].first()

  test("masks email, ip, ssn, phone with typed tokens") {
    assert(run("mail a.b+c@x-corp.co.uk now") == "mail [EMAIL] now")
    assert(run("host 192.168.001.1 up") == "host [IP] up")
    assert(run("ssn 123-45-6789 ok") == "ssn [SSN] ok")
    assert(run("call 555-123-4567 today") == "call [PHONE] today")
  }

  test("all four in one string, repeated matches all masked") {
    assert(run("a@b.com c@d.org 1.2.3.4 999-88-7777 111-222-3333") ==
      "[EMAIL] [EMAIL] [IP] [SSN] [PHONE]")
  }

  test("ssn shape is not half-eaten by the phone rule (and vice versa)") {
    assert(run("123-45-6789 and 123-456-7890") == "[SSN] and [PHONE]")
  }

  test("word boundaries: digit runs inside longer tokens are left alone") {
    assert(run("v1.2.3.4beta stays") == "v1.2.3.4beta stays")
    assert(run("id 1234-56-7890 stays") == "id 1234-56-7890 stays")
  }

  test("email wins before ip can nibble its dotted digits") {
    assert(run("u1.2.3.4@h.io") == "[EMAIL]")
  }
}
