// DFS support for the scratch parity build: the reference calls
// boost::detail::depth_first_visit_impl directly
// (Graph/DepthFirstSearch.h:39) with the standard boost visitor
// protocol.  This is a clean-room iterative implementation of that
// protocol (white->gray on discover, tree/back/forward_or_cross edge
// classification, black on finish) — no boost code consulted.
#ifndef STUB_BOOST_DFS
#define STUB_BOOST_DFS 1
#include <boost/graph/breadth_first_search.hpp>
#include <utility>
#include <vector>

namespace boost {
namespace detail {

struct nontruth2 {
	template <class A, class B>
	bool operator()(const A&, const B&) const { return false; }
};

template <class Graph, class Visitor, class ColorMap, class Terminator>
void depth_first_visit_impl(const Graph& g,
		typename graph_traits<Graph>::vertex_descriptor start,
		Visitor& vis, ColorMap color, Terminator term)
{
	typedef graph_traits<Graph> GT;
	typedef typename GT::vertex_descriptor V;
	typedef typename GT::out_edge_iterator EIt;
	typedef typename property_traits<ColorMap>::value_type ColorValue;
	typedef color_traits<ColorValue> Color;

	// explicit stack of (vertex, next-edge-range) frames: contig
	// graphs run to millions of vertices, recursion would overflow
	std::vector<std::pair<V, std::pair<EIt, EIt> > > stack;
	put(color, start, Color::gray());
	vis.discover_vertex(start, g);
	if (term(start, g)) {
		put(color, start, Color::black());
		vis.finish_vertex(start, g);
		return;
	}
	stack.push_back(std::make_pair(start, out_edges(start, g)));
	while (!stack.empty()) {
		V u = stack.back().first;
		std::pair<EIt, EIt>& range = stack.back().second;
		bool descended = false;
		while (range.first != range.second) {
			typename GT::edge_descriptor e = *range.first;
			++range.first;
			vis.examine_edge(e, g);
			V v = target(e, g);
			ColorValue c = get(color, v);
			if (c == Color::white()) {
				vis.tree_edge(e, g);
				put(color, v, Color::gray());
				vis.discover_vertex(v, g);
				if (term(v, g)) {
					put(color, v, Color::black());
					vis.finish_vertex(v, g);
					continue;
				}
				stack.push_back(
					std::make_pair(v, out_edges(v, g)));
				descended = true;
				break;
			} else if (c == Color::gray()) {
				vis.back_edge(e, g);
			} else {
				vis.forward_or_cross_edge(e, g);
			}
		}
		if (!descended) {
			// u's edges are exhausted (no push happened, so the
			// top frame is still u)
			stack.pop_back();
			put(color, u, Color::black());
			vis.finish_vertex(u, g);
		}
	}
}

} // namespace detail
} // namespace boost
#endif
