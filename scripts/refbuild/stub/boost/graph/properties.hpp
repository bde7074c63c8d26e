// minimal boost property tag machinery (scratch parity build)
#ifndef STUB_BOOST_GRAPH_PROPERTIES
#define STUB_BOOST_GRAPH_PROPERTIES 1
#include <boost/graph/graph_traits.hpp>
namespace boost {
struct no_property {};
template <class Tag, class T, class Base = no_property>
struct property {
	typedef Base next_type;
	typedef Tag tag_type;
	typedef T value_type;
	property(const T& v = T(), const Base& b = Base()) : m_value(v), m_base(b) {}
	T m_value;
	Base m_base;
};
enum vertex_bundle_t { vertex_bundle };
enum edge_bundle_t { edge_bundle };
enum vertex_index_t { vertex_index };
enum vertex_name_t { vertex_name };
enum edge_name_t { edge_name };
enum edge_weight_t { edge_weight };
template <class G>
struct vertex_bundle_type { typedef typename G::vertex_bundled type; };
template <class G>
struct edge_bundle_type { typedef typename G::edge_bundled type; };
template <class G>
struct vertex_property { typedef typename G::vertex_property_type type; };
template <class G>
struct edge_property { typedef typename G::edge_property_type type; };
template <class G, class Tag>
struct property_map {};
}
#define BOOST_INSTALL_PROPERTY(KIND, NAME) \
	template struct property_kind_stub_##KIND##_##NAME {}
namespace boost { template <class K> struct property_kind_stub_helper {}; }
#undef BOOST_INSTALL_PROPERTY
#define BOOST_INSTALL_PROPERTY(KIND, NAME) /* nothing needed */
#endif
