// minimal SFINAE-friendly boost::graph_traits + category tags + tie +
// property-map/color machinery (scratch parity build; ABySS specializes
// graph_traits for its own graph types, so the primary template only
// needs to forward member typedefs when they exist)
#ifndef STUB_BOOST_GRAPH_TRAITS
#define STUB_BOOST_GRAPH_TRAITS 1
#include <cstddef>
#include <utility>
#include <tuple>
#include <type_traits>
namespace boost {
using std::tie;
using std::make_tuple;
using std::get;
namespace tuples { using std::tie; using std::get; using std::ignore; }
struct directed_tag {};
struct undirected_tag {};
struct bidirectional_tag : directed_tag {};
struct allow_parallel_edge_tag {};
struct disallow_parallel_edge_tag {};
struct incidence_graph_tag {};
struct adjacency_graph_tag {};
struct bidirectional_graph_tag : incidence_graph_tag {};
struct vertex_list_graph_tag {};
struct edge_list_graph_tag {};
namespace detail {
inline bool is_directed(directed_tag) { return true; }
inline bool is_directed(undirected_tag) { return false; }
}
namespace gt_detail {
template <class...> using void_t = void;
#define STUB_GT_MEMBER(NAME) \
template <class G, class = void> struct has_##NAME {}; \
template <class G> struct has_##NAME<G, void_t<typename G::NAME>> { \
	typedef typename G::NAME NAME; };
STUB_GT_MEMBER(vertex_descriptor)
STUB_GT_MEMBER(edge_descriptor)
STUB_GT_MEMBER(directed_category)
STUB_GT_MEMBER(edge_parallel_category)
STUB_GT_MEMBER(traversal_category)
STUB_GT_MEMBER(vertices_size_type)
STUB_GT_MEMBER(edges_size_type)
STUB_GT_MEMBER(degree_size_type)
STUB_GT_MEMBER(vertex_iterator)
STUB_GT_MEMBER(edge_iterator)
STUB_GT_MEMBER(out_edge_iterator)
STUB_GT_MEMBER(in_edge_iterator)
STUB_GT_MEMBER(adjacency_iterator)
#undef STUB_GT_MEMBER
template <class G, class = void> struct null_v {};
template <class G> struct null_v<G, void_t<typename G::vertex_descriptor>> {
	static typename G::vertex_descriptor null_vertex() {
		return typename G::vertex_descriptor();
	}
};
}
template <class G>
struct graph_traits
	: gt_detail::has_vertex_descriptor<G>,
	  gt_detail::has_edge_descriptor<G>,
	  gt_detail::has_directed_category<G>,
	  gt_detail::has_edge_parallel_category<G>,
	  gt_detail::has_traversal_category<G>,
	  gt_detail::has_vertices_size_type<G>,
	  gt_detail::has_edges_size_type<G>,
	  gt_detail::has_degree_size_type<G>,
	  gt_detail::has_vertex_iterator<G>,
	  gt_detail::has_edge_iterator<G>,
	  gt_detail::has_out_edge_iterator<G>,
	  gt_detail::has_in_edge_iterator<G>,
	  gt_detail::has_adjacency_iterator<G>,
	  gt_detail::null_v<G> {};
// property-map machinery (real boost spreads this over properties.hpp /
// property_map.hpp; centralized here so include order never matters)
template <class PM> struct property_traits {
	typedef typename PM::key_type key_type;
	typedef typename PM::value_type value_type;
	typedef typename PM::reference reference;
	typedef typename PM::category category;
};
struct readable_property_map_tag {};
struct writable_property_map_tag {};
struct read_write_property_map_tag : readable_property_map_tag, writable_property_map_tag {};
struct lvalue_property_map_tag : read_write_property_map_tag {};
template <class Reference, class PropertyMap>
struct put_get_helper {};
template <class R, class PM>
inline typename PM::reference get(const put_get_helper<R, PM>& pm, const typename PM::key_type& k) {
	return static_cast<const PM&>(pm)[k];
}
enum default_color_type { white_color, gray_color, green_color, red_color, black_color };
template <class ColorValue>
struct color_traits {
	static default_color_type white() { return white_color; }
	static default_color_type gray() { return gray_color; }
	static default_color_type green() { return green_color; }
	static default_color_type red() { return red_color; }
	static default_color_type black() { return black_color; }
};
}
// BGL provides source/target for std::pair edge descriptors; declared at
// global scope here so ADL via globally-declared graph types finds them
// (scratch parity build)
template <class T, class G>
inline T source(std::pair<T, T> e, const G&) { return e.first; }
template <class T, class G>
inline T target(std::pair<T, T> e, const G&) { return e.second; }
#endif
// ---- appended for the stage-2..8 parity tools ----
#ifndef STUB_BOOST_GRAPH_TRAITS_STAGE2
#define STUB_BOOST_GRAPH_TRAITS_STAGE2 1
#include <cstddef>
#include <memory>
#include <vector>
namespace boost {

/** No-op DFS/BFS visitor bases (boost protocol). */
struct default_dfs_visitor {
	template <class V, class G> void initialize_vertex(const V&, const G&) {}
	template <class V, class G> void start_vertex(const V&, const G&) {}
	template <class V, class G> void discover_vertex(const V&, const G&) {}
	template <class E, class G> void examine_edge(const E&, const G&) {}
	template <class E, class G> void tree_edge(const E&, const G&) {}
	template <class E, class G> void back_edge(const E&, const G&) {}
	template <class E, class G> void forward_or_cross_edge(const E&, const G&) {}
	template <class E, class G> void finish_edge(const E&, const G&) {}
	template <class V, class G> void finish_vertex(const V&, const G&) {}
};
typedef default_dfs_visitor default_bfs_visitor;

/** Vector-backed property map addressed through an index map
 * (shared storage, copyable — the boost vector_property_map shape). */
template <class V, class IndexMap>
class vector_property_map {
  public:
	typedef V value_type;
	typedef V& reference;
	typedef std::size_t key_type_fallback;
	explicit vector_property_map(std::size_t n = 0)
		: m_store(new std::vector<V>(n)) {}
	template <class K>
	V& operator[](const K& k) const {
		std::size_t i = static_cast<std::size_t>(get(m_index, k));
		if (i >= m_store->size())
			m_store->resize(i + 1);
		return (*m_store)[i];
	}
  private:
	std::shared_ptr<std::vector<V> > m_store;
	IndexMap m_index;
};
template <class V, class IM, class K>
inline void put(const vector_property_map<V, IM>& pm, const K& k,
		const V& v) { pm[k] = v; }
template <class V, class IM, class K>
inline V get(const vector_property_map<V, IM>& pm, const K& k) {
	return pm[k];
}
template <class V, class IM>
struct property_traits<vector_property_map<V, IM> > {
	typedef V value_type;
	typedef V& reference;
};

}
#endif // STUB_BOOST_GRAPH_TRAITS_STAGE2
