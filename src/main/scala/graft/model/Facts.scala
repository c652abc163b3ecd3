package graft.model

/** Scala ADT for the reference's fact-based graph schema
  * (reference: src/schema.thrift; mapping per SURVEY.md §1.4).
  *
  * Thrift unions become structs of nullable members plus a discriminator
  * (`kind` for DataUnit, exactly-one-non-null for PersonId/PageId); the
  * union invariant is enforced at ingest (FactStore.validate). Timestamps
  * stay integer epoch seconds to preserve the reference's bucket math
  * (schema.thrift:71-75 uses i32 seconds).
  */
final case class Location(
    city: Option[String], state: Option[String], country: Option[String])

/** PersonID union: cookie xor userId (schema.thrift:4-7). The reference's
  * total order — union tag first, then value (schema/PersonID.java:322-326,
  * cookie tag 1 < user_id tag 2) — is exposed as `sortKey` so "smallest
  * id wins" logic matches Thrift compareTo.
  */
final case class PersonId(cookie: Option[String], userId: Option[Long]) {
  def sortKey: (Int, String) =
    cookie.map(c => (1, c)).getOrElse((2, f"${userId.get}%019d"))
}
object PersonId {
  def ofCookie(c: String): PersonId = PersonId(Some(c), None)
  def ofUser(u: Long): PersonId = PersonId(None, Some(u))
}

final case class PageId(url: String)

/** Provenance (schema.thrift:71-75). */
final case class Pedigree(trueAsOfSecs: Long, source: String)

final case class PersonPropertyValue(
    fullName: Option[String], gender: Option[String], location: Option[Location])

final case class PersonProperty(id: PersonId, value: PersonPropertyValue)
final case class PageProperty(id: PageId, pageViews: Option[Int])
final case class EquivEdge(id1: PersonId, id2: PersonId)
final case class PageViewEdge(person: PersonId, page: PageId, nonce: Long)

object FactKind {
  val PersonProperty = "person_property"
  val PageProperty = "page_property"
  val Equiv = "equiv"
  val PageView = "page_view"
  val all: Seq[String] = Seq(PersonProperty, PageProperty, Equiv, PageView)
}

/** One immutable fact: Pedigree + exactly one DataUnit member, with `kind`
  * as the union discriminator — also the physical partition column, which
  * is what turns the reference's Pail vertical partitioning
  * (tap/SplitDataPailStructure.java:97-136) into Catalyst partition
  * pruning.
  */
final case class Fact(
    kind: String,
    pedigree: Pedigree,
    personProperty: Option[PersonProperty],
    pageProperty: Option[PageProperty],
    equiv: Option[EquivEdge],
    pageView: Option[PageViewEdge]) {

  def unitCount: Int =
    Seq(personProperty, pageProperty, equiv, pageView).count(_.isDefined)
}

object Fact {
  def pageView(person: PersonId, url: String, tsSecs: Long, nonce: Long = 1L,
      source: String = "self"): Fact =
    Fact(FactKind.PageView, Pedigree(tsSecs, source), None, None, None,
      Some(PageViewEdge(person, PageId(url), nonce)))

  def equiv(id1: PersonId, id2: PersonId, tsSecs: Long, source: String = "self"): Fact =
    Fact(FactKind.Equiv, Pedigree(tsSecs, source), None, None,
      Some(EquivEdge(id1, id2)), None)

  def personProperty(id: PersonId, value: PersonPropertyValue, tsSecs: Long,
      source: String = "self"): Fact =
    Fact(FactKind.PersonProperty, Pedigree(tsSecs, source),
      Some(PersonProperty(id, value)), None, None, None)

  def pageProperty(id: PageId, pageViews: Int, tsSecs: Long,
      source: String = "self"): Fact =
    Fact(FactKind.PageProperty, Pedigree(tsSecs, source), None,
      Some(PageProperty(id, Some(pageViews))), None, None)
}
